"""Sources / sinks: the reference's fread/fwrite surface (SURVEY §2.1)
re-expressed on Spark's DataSource readers/writers.

The reference's parallel CSV machinery (mmap, chunked sampling, OpenMP —
/root/reference/src/fread.c, src/fwrite.c) is replaced wholesale by
Spark's distributed text datasource: every executor reads its own file
split, schema inference samples like fread's type sampler, and writes
shard per partition (the scale-correct shape — a single 100 TB CSV file
is an anti-pattern, so `fwrite` writes a directory unless asked).
"""

from .fread import fread, fread_jsonl, fread_orc, fread_parquet
from .fwrite import (
    fwrite,
    fwrite_jsonl,
    fwrite_orc,
    fwrite_parquet,
    setindex_physical,
)

__all__ = [
    "fread", "fread_jsonl", "fread_orc", "fread_parquet",
    "fwrite", "fwrite_jsonl", "fwrite_orc", "fwrite_parquet",
    "setindex_physical",
]
