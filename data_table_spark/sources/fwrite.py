"""fwrite: data.table's parallel CSV writer (reference R/fwrite.R:1-17,
src/fwrite.c) on Spark's csv sink.

Mapping:
- OpenMP chunked write (src/fwrite.c) -> one shard per partition,
  written in parallel by executors. `single_file=True` coalesces to one
  partition for small outputs (the reference's single-file behavior);
  the default keeps shards — at 100 TB a single file is the bottleneck.
- quote="auto" (quote iff needed) -> csv option quoteAll=false + escape
- sep2 for list columns (R/fwrite.R:6) -> concat_ws(sep2) pre-pass
- dateTimeAs ISO (R/fwrite.R:10) -> timestampFormat ISO-8601
- compress="gzip" (src/fwrite.c:586) -> option compression=gzip
- append=TRUE -> mode("append")
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _r_num2char(c, scipen: int, na: str, digits=None, exp=None,
                dec: str = ".", force_decimal: bool = False):
    """R-exact double -> character (reference src/fwrite.c:184
    writeNumeric; tests.Rraw 2112, round-13 port): 15 significant
    digits (NUM_SF), trailing zeros stripped, fixed vs scientific
    decided by the reference's width formula

        fixed iff width <= sf + (sf>1) + 2 + (|exp|>99 ? 3 : 2) + scipen

    where sf = significant digits, exp = decimal exponent, width = the
    fixed-notation field width. ``scipen`` biases toward fixed notation
    (R's options(scipen=)). NaN writes the na= string, +-Inf writes
    Inf/-Inf, zero writes "0" (src/fwrite.c:194-204). Built entirely
    from JVM string functions — whole-stage codegen, no UDF in the
    write path.

    Known divergence (documented, property-tested): Java's %.14E —
    this expression's digit source — pads/rounds the SHORTEST
    round-trip repr, which is correctly rounded to 15 significant
    digits for every NORMAL double but can differ from the reference's
    trailing digits on SUBNORMALS (|x| < 2.23e-308), where binary ULPs
    dwarf the 15th-digit place. Values still parse back within one
    unit of the 15th significant digit (15-sf doubles are lossy in the
    reference too). ``digits``/``exp`` may be passed as pre-computed
    columns (fwrite stages them in separate projections so the shared
    subexpressions aren't re-inlined 15× — a single flat expression
    blew the 64 KB generated-method limit and knocked the whole
    projection out of codegen). ``dec`` replaces the decimal
    separator (tests.Rraw 1733.2); ``force_decimal`` appends a bare
    separator to whole-number doubles — "1." / "0." — matching the
    reference forceDecimal=TRUE (tests.Rraw 2338, src/fwrite.c
    isWholeNumber branch; integers and scientific notation are
    untouched)."""
    if digits is None or exp is None:
        m = F.format_string("%.14E", F.abs(c))  # "3.14159265358979E+00"
        digits = F.regexp_replace(
            F.concat(F.substring(m, 1, 1), F.substring(m, 3, 14)),
            "0+$", "",
        )
        exp = F.get(F.split(m, "E"), 1).cast("int")
    sf = F.length(digits)
    dr = sf - exp - 1  # digits right of the decimal in fixed notation
    dl0 = (
        F.when(dr <= 0, -dr)
        .when(sf > dr, F.lit(0))
        .otherwise(F.lit(1))  # leading "0." zero
    )
    # reference src/fwrite.c:270: forceDecimal appends "." to whole
    # numbers (the dr<=0 branch), so their decimal-format width is one
    # wider BEFORE the fixed-vs-scientific threshold compare
    whole_pad = 1 if force_decimal else 0
    width = (
        F.when(dr <= 0, sf + dl0 + whole_pad)
        .when(sf > dr, sf + 1)
        .otherwise(dr + 1 + dl0)
    )
    threshold = (
        sf
        + F.when(sf > 1, 1).otherwise(0)
        + 2
        + F.when(F.abs(exp) > 99, 3).otherwise(2)
        + F.lit(int(scipen))
    )
    zeros = lambda n: F.repeat(F.lit("0"), F.greatest(n, F.lit(0)))
    whole_tail = F.lit(dec if force_decimal else "")
    fixed = (
        F.when(dr <= 0, F.concat(digits, zeros(dl0), whole_tail))
        .when(
            sf > dr,
            F.concat(
                digits.substr(F.lit(1), sf - dr),
                F.lit(dec),
                digits.substr(sf - dr + 1, F.lit(20)),
            ),
        )
        .otherwise(F.concat(F.lit("0" + dec), zeros(dr - sf), digits))
    )
    mant = F.when(
        sf > 1,
        F.concat(F.substring(digits, 1, 1), F.lit(dec),
                 digits.substr(F.lit(2), sf - 1)),
    ).otherwise(digits)
    expstr = F.concat(
        F.when(exp < 0, F.lit("e-")).otherwise(F.lit("e+")),
        F.when(F.abs(exp) > 99, F.abs(exp).cast("string")).otherwise(
            F.lpad(F.abs(exp).cast("string"), 2, "0")
        ),
    )
    sci = F.concat(mant, expstr)
    body = F.when(width <= threshold, fixed).otherwise(sci)
    sign = F.when(c < 0, F.lit("-")).otherwise(F.lit(""))
    return (
        F.when(F.isnull(c), F.lit(None).cast("string"))
        .when(F.isnan(c), F.lit(na))
        .when(c == 0.0, F.lit("0" + (dec if force_decimal else "")))
        .when(c == float("inf"), F.lit("Inf"))
        .when(c == float("-inf"), F.lit("-Inf"))
        .otherwise(F.concat(sign, body))
    )


def _iso_ts(c, dec: str = "."):
    """Reference-exact ISO-8601 UTC timestamp rendering (src/fwrite.c
    writePOSIXct, tests.Rraw 2281 — round-13 port): subseconds are
    OMITTED when zero, written as 3 digits when whole milliseconds,
    else 6 digits (microseconds), separated by ``dec`` — the writer's
    fixed .SSSSSS format always wrote 6. Codegen string expression;
    nulls propagate through concat to the writer's nullValue."""
    us = F.unix_micros(c)
    sub = F.pmod(us, F.lit(1_000_000))
    base = F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")
    subsec = (
        F.when(sub == 0, F.lit(""))
        .when(
            sub % 1000 == 0,
            F.concat(F.lit(dec),
                     F.lpad((sub / 1000).cast("int").cast("string"),
                            3, "0")),
        )
        .otherwise(
            F.concat(F.lit(dec), F.lpad(sub.cast("string"), 6, "0"))
        )
    )
    return F.concat(base, subsec, F.lit("Z"))


def fwrite(
    dt,
    path: str,
    sep: str = ",",
    sep2: str = "|",
    na: str = "",
    quote: str = "auto",
    qmethod: str = "double",
    header: bool = True,
    append: bool = False,
    compress: str = "none",
    date_time_as: str = "ISO",
    bom: bool = False,
    yaml: bool = False,
    single_file: bool = False,
    logical01: bool = False,
    scipen: int | None = 0,
    dec: str = ".",
    force_decimal: bool = False,
) -> None:
    """See module docstring. Additional reference options:

    - ``qmethod`` (R/fwrite.R, man/fwrite.Rd:39): "double" doubles
      embedded quotes (csv standard, the reference default) via
      escape='"'; "escape" backslash-escapes them.
    - ``date_time_as="squash"`` (man/fwrite.Rd:49): timestamps as the
      17-digit integer yyyyMMddHHmmssSSS (ms always present), dates as
      yyyyMMdd — enables integer div/mod part extraction.
    - ``bom`` (man/fwrite.Rd:63): UTF-8 BOM (EF BB BF) at file start.
    - ``yaml`` (man/fwrite.Rd:62): CSVY metadata header (column names /
      types) before the data.
    ``bom``/``yaml`` prepend bytes to the ONE output file, so they
    require ``single_file=True`` — a sharded 100 TB write has no "start
    of file"; store metadata in the catalog instead."""
    df: DataFrame = dt.df if hasattr(dt, "df") else dt
    if (bom or yaml) and not single_file:
        raise ValueError(
            "bom/yaml prepend a file header: pass single_file=True"
            " (sharded outputs have no single file start)"
        )
    if (bom or yaml) and compress not in (None, "", "none"):
        raise ValueError("bom/yaml cannot be prepended to compressed output")
    # serialize array columns with sep2, the reference's list-column rule
    for f in df.schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            df = df.withColumn(
                f.name,
                F.concat_ws(sep2, F.col(f.name).cast("array<string>")),
            )
    # logical01 (reference R/fwrite.R:6): booleans as 1/0 instead of
    # the writer's true/false — round-trips with fread(logical01=True)
    if logical01:
        for f in df.schema.fields:
            if isinstance(f.dataType, T.BooleanType):
                df = df.withColumn(f.name, F.col(f.name).cast("int"))
    # the CSVY yaml header must describe the LOGICAL schema (double,
    # timestamp), not the string renderings below
    schema_df = df
    # column transforms happen BEFORE the writer is built so every
    # branch keeps the full option set (quote/emptyValue/etc.)
    if date_time_as == "ISO":
        # reference-exact subsecond rule + dec support (writePOSIXct)
        for f in df.schema.fields:
            if isinstance(f.dataType, T.TimestampType):
                df = df.withColumn(f.name, _iso_ts(F.col(f.name), dec))
    elif date_time_as == "epoch":
        for f in df.schema.fields:
            if isinstance(f.dataType, T.TimestampType):
                df = df.withColumn(f.name, F.unix_timestamp(F.col(f.name)))
    elif date_time_as == "squash":
        for f in df.schema.fields:
            if isinstance(f.dataType, T.TimestampType):
                df = df.withColumn(
                    f.name,
                    F.date_format(F.col(f.name), "yyyyMMddHHmmssSSS").cast("long"),
                )
            elif isinstance(f.dataType, T.DateType):
                df = df.withColumn(
                    f.name,
                    F.date_format(F.col(f.name), "yyyyMMdd").cast("int"),
                )
    # scipen (reference R/fwrite.R:7,26; tests.Rraw 2112): R-exact
    # double rendering — 15 significant digits, fixed-vs-scientific by
    # the reference width formula, biased by scipen. None means 0
    # (2112.02/.05: scipen=NULL does NOT read the option). Applied to
    # DoubleType only: FloatType has no reference analog (R has no
    # float32) and stays on the writer's native rendering.
    if dec == sep and len(df.columns) > 1 and not df.isEmpty():
        # reference R/fwrite.R:48 — zero-row / single-column frames
        # never need both characters, so they are allowed
        raise ValueError("dec and sep must be distinct")
    dbl = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, T.DoubleType)
    ]
    if dbl:
        sp = int(scipen or 0)
        # three stacked projections: the shared digit/exponent columns
        # are non-cheap, so CollapseProject keeps them staged instead of
        # re-inlining them ~15x into one over-64KB codegen method
        df = df.withColumns({
            f"__fw_m_{c}": F.format_string("%.14E", F.abs(F.col(c)))
            for c in dbl
        })
        stage2 = {}
        for c in dbl:
            m = F.col(f"__fw_m_{c}")
            stage2[f"__fw_g_{c}"] = F.regexp_replace(
                F.concat(F.substring(m, 1, 1), F.substring(m, 3, 14)),
                "0+$", "",
            )
            stage2[f"__fw_e_{c}"] = F.get(F.split(m, "E"), 1).cast("int")
        df = df.withColumns(stage2)
        df = df.withColumns({
            c: _r_num2char(
                F.col(c), sp, na,
                digits=F.col(f"__fw_g_{c}"), exp=F.col(f"__fw_e_{c}"),
                dec=dec, force_decimal=force_decimal,
            )
            for c in dbl
        }).drop(*[p + c for c in dbl
                  for p in ("__fw_m_", "__fw_g_", "__fw_e_")])
    if single_file:
        df = df.coalesce(1)
    writer = (
        df.write.option("sep", sep)
        .option("header", str(bool(header)).lower())
        .option("nullValue", na)
        .option("emptyValue", "")
        .option("quoteAll", str(quote == "all").lower())
        .option("escape", '"' if qmethod == "double" else "\\")
    )
    if date_time_as == "ISO":
        # TimestampType columns were already string-rendered above;
        # this option still covers TIMESTAMP_NTZ columns
        writer = writer.option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
        )
    if compress and compress != "none":
        writer = writer.option("compression", compress)
    writer.mode("append" if append else "overwrite").csv(path)
    if bom or yaml:
        _prepend_file_header(schema_df, path, bom=bom, yaml=yaml)


def _prepend_file_header(df: DataFrame, path: str, bom: bool, yaml: bool) -> None:
    """Driver-side prepend of BOM / CSVY yaml metadata to the single
    part file (single_file=True guaranteed by the caller)."""
    import glob
    import os

    parts = sorted(glob.glob(os.path.join(path, "part-*.csv*")))
    if len(parts) != 1:  # pragma: no cover - guarded by single_file
        raise RuntimeError(f"expected one part file in {path}, got {parts}")
    part = parts[0]
    headers: list[bytes] = []
    if bom:
        headers.append(b"\xef\xbb\xbf")
    if yaml:
        lines = ["---", "schema:", "  fields:"]
        for f in df.schema.fields:
            lines += [f"  - name: {f.name}", f"    type: {f.dataType.simpleString()}"]
        lines.append("---")
        headers.append(("\n".join(lines) + "\n").encode())
    with open(part, "rb") as fh:
        body = fh.read()
    with open(part, "wb") as fh:
        fh.write(b"".join(headers) + body)
    # the local Hadoop FS wrote a .crc sidecar for the original bytes;
    # rewriting the part file invalidates it and a later Spark read
    # fails with ChecksumException — drop it.
    crc = os.path.join(
        os.path.dirname(part), "." + os.path.basename(part) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)


def fwrite_parquet(
    dt,
    path: str,
    partition_by=None,
    bucket_by=None,
    n_buckets: int = 32,
    table: str | None = None,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Parquet sink — the 100 TB-native output path (no reference
    analog; fwrite is CSV-only). `partition_by` gives directory
    partition pruning on read; `bucket_by` (requires `table`, via
    saveAsTable) gives shuffle-free co-located joins on the bucket
    key — the durable form of data.table's physical `setkey`. With
    both `table` and `path`, the bucketed table is EXTERNAL at
    `path` (location pinned regardless of the session's warehouse
    dir)."""
    df = dt.df if hasattr(dt, "df") else dt
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        w = w.partitionBy(*cols)
    if bucket_by:
        if not table:
            raise ValueError("bucketBy requires saveAsTable: pass table=")
        cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
        if path:
            w = w.option("path", path)
        w.bucketBy(n_buckets, *cols).sortBy(*cols).format("parquet").saveAsTable(table)
        return
    w.parquet(path)


def setindex_physical(
    dt, spark, table: str, cols, n_buckets: int = 8, path: str | None = None
):
    """Physical secondary index (reference R/setkey.R:11-19 ``setindex``;
    the logical `DT.setindex` is a metadata no-op — SURVEY §2.6): persist
    the table bucketed AND sorted by `cols` so every later equi-join /
    aggregation on the index columns reads pre-hashed buckets and elides
    its Exchange — Spark's durable analog of data.table's sorted
    physical index. Returns the re-read DT backed by the bucketed table
    (bucket metadata rides the session catalog).

    At 100 TB this is the difference between re-shuffling a fact table
    per join and paying the shuffle ONCE at write: two bucketed sides
    with matching bucket counts sort-merge-join with zero exchanges.
    """
    from ..core import DT

    cols = [cols] if isinstance(cols, str) else list(cols)
    fwrite_parquet(
        dt, path or "", bucket_by=cols, n_buckets=n_buckets, table=table
    )
    return DT(spark.table(table), key=cols)


def fwrite_jsonl(dt, path: str, mode: str = "overwrite",
                 compression: str | None = None) -> None:
    """JSON-lines sink (one JSON object per line, sharded) — the
    training-data interchange format (no reference analog; fwrite is
    CSV-only). Strings/integers round-trip exactly; escaping is
    JSON-standard. Narrow per-partition write, no shuffle."""
    df = dt.df if hasattr(dt, "df") else dt
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def fwrite_orc(dt, path: str, mode: str = "overwrite",
               compression: str = "zstd") -> None:
    """ORC sink — the other columnar interchange format Spark speaks
    natively (vectorized reader, predicate pushdown, zstd). Same write
    surface as fwrite_parquet without the bucketing path."""
    df = dt.df if hasattr(dt, "df") else dt
    df.write.mode(mode).option("compression", compression).orc(path)
