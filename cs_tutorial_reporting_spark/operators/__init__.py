from .incremental import dedup_against, incremental_filter, watermark
from .project import null_if_empty, project_cast

__all__ = [
    "dedup_against",
    "incremental_filter",
    "watermark",
    "null_if_empty",
    "project_cast",
]
