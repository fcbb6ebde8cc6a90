from .pipeline import incremental_load, load_report_table

__all__ = ["incremental_load", "load_report_table"]
