"""Container sniffing + dispatch — the front door of a mixed-media
ingest: a crawl dump column holds SOME binary per row; the engine must
identify the container from its magic bytes and route it to the right
decoder (never trust an extension or an upstream content-type). One
Arrow pass: sniff → dispatch → REAL decode (every branch is one of the
engine's full codec implementations) → normalized (format, units)
features, where units = pixels for images, samples for audio,
frame-pixels for video.

Unknown magic raises — a mixed-ingest front door that silently guesses
is how corrupt shards poison a corpus (the DLQ pattern in
sources/evolution.py is the quarantine half of this story).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .avi import avi_bytes, decode_avi
from .bmp import bmp_bytes, decode_bmp
from .gif import decode_gif, gif_bytes
from .png import decode_png, png_bytes
from .tiff import decode_tiff, tiff_bytes
from .wav import decode_wav, wav_bytes

#: doc_id % 6 → container family for the synthetic mixed corpus
SYNTHS = [
    ("bmp", bmp_bytes),
    ("gif", gif_bytes),
    ("png", png_bytes),
    ("tiff", tiff_bytes),
    ("wav", wav_bytes),
    ("avi", avi_bytes),
]


def sniff_format(content: bytes) -> str:
    """Identify the container from magic bytes alone."""
    if content[:2] == b"BM":
        return "bmp"
    if content[:4] == b"GIF8":
        return "gif"
    if content[:4] == b"\x89PNG":
        return "png"
    if content[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return "wav"
    if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
        return "avi"
    raise ValueError(f"unknown container magic: {content[:12]!r}")


def sniff_and_units(content: bytes) -> tuple[str, int]:
    """Sniff, run the REAL decoder for that family, return the
    normalized content size (pixels / samples / frame-pixels)."""
    fmt = sniff_format(content)
    if fmt == "bmp":
        return fmt, decode_bmp(content)["n_pixels"]
    if fmt == "gif":
        return fmt, decode_gif(content)["n_pixels"]
    if fmt == "png":
        return fmt, decode_png(content)["n_pixels"]
    if fmt == "tiff":
        return fmt, decode_tiff(content)["n_pixels"]
    if fmt == "wav":
        return fmt, decode_wav(content)["n_samples"]
    d = decode_avi(content)
    return fmt, d["n_frames"] * d["width"] * d["height"]


SNIFF_SCHEMA = "doc_id bigint, fmt string, units bigint"


def synth_mixed_and_sniff(
    df: DataFrame, payload_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Build a MIXED corpus (container chosen by doc_id % 6), then
    sniff-and-dispatch WITHOUT using the branch that built each row —
    the round-trip proves sniffing, not bookkeeping."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                _, synth = SYNTHS[int(doc_id) % len(SYNTHS)]
                fmt, units = sniff_and_units(synth(bytes(payload)))
                rows.append((int(doc_id), fmt, int(units)))
            yield pd.DataFrame(rows, columns=["doc_id", "fmt", "units"])

    from .columns import fan_out_compute

    # compute-bound decode: escape the 1-2-partition small-file trap
    # (columns.py::fan_out_compute — no-op on already-wide inputs)
    return fan_out_compute(
        df.select(F.col(id_col), F.col(payload_col)), id_col
    ).mapInPandas(op, SNIFF_SCHEMA)
