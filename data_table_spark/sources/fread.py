"""fread: data.table's CSV ingest (reference R/fread.R:37-46, C core
src/fread.c) on Spark's distributed csv datasource.

Feature mapping (reference -> here):
- parallel chunked read (src/fread.c:1545 mmap + OpenMP chunks)
    -> file-split parallelism of the csv datasource (one task per split)
- sep/header/type auto-detection by sampling (src/fread.c:1807-2101)
    -> driver-side sample of the first lines for sep/header; Spark
      `inferSchema` (its own distributed sampling pass) for types
- select/drop/colClasses (R/fread.R:42)  -> explicit StructType or
  post-read projection (column pruning reaches the scan)
- na.strings, skip, nrows, fill, quote, encoding -> csv options
- gz/bz2 transparent decompression (R/fread.R:1-35) -> by extension,
  handled by Hadoop codecs (note: gzip is not splittable; at 100 TB
  store many gz shards or use parquet)

Type detection intentionally delegates to Spark: fread's sampled type
ladder (logical<int<int64<double<char, src/fread.c:"type bumping") is
what `inferSchema` does distributedly.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..core import DT

_SEPS = [",", "\t", ";", "|", " "]

_TYPE_MAP = {
    "logical": T.BooleanType(),
    "integer": T.IntegerType(),
    "integer64": T.LongType(),
    "double": T.DoubleType(),
    "numeric": T.DoubleType(),
    "character": T.StringType(),
    "string": T.StringType(),
    "Date": T.DateType(),
    "IDate": T.DateType(),
    "POSIXct": T.TimestampType(),
    # CSVY / Spark simpleString spellings (fwrite's yaml header emits
    # simpleString; the csvy.org table-schema spec uses the rest)
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "number": T.DoubleType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
}


def _detect_sep(sample: list[str]) -> str:
    """Pick the candidate sep with a consistent, maximal field count
    across sampled lines (simplified form of fread's sampler,
    src/fread.c:1807)."""
    import csv as _csv
    import io as _io

    text = "\n".join(line for line in sample if line)

    def _counts(sep: str) -> list[int]:
        try:
            # parse the WHOLE sample quote-statefully: a quoted field
            # spanning lines (multiline records) must count as part of
            # one record, and quoted separators must not inflate counts
            recs = list(_csv.reader(_io.StringIO(text), delimiter=sep))
            return [len(r) for r in recs if r]
        except Exception:
            return [line.count(sep) + 1 for line in sample if line]

    def _score(sep: str):
        counts = _counts(sep)
        if not counts:
            return None
        # most-common field count + its coverage: a ragged tail (e.g.
        # a short footer line) must not veto the real separator
        mode = max(set(counts), key=counts.count)
        if mode < 2:
            return None
        return counts.count(mode) / len(counts), mode

    best, best_score = ",", (0.0, 1)
    for sep in _SEPS:
        if sep == " ":
            continue  # space only as a last resort (free text has spaces)
        s = _score(sep)
        if s and s > best_score:
            best, best_score = sep, s
    if best_score == (0.0, 1):
        s = _score(" ")
        if s:
            best = " "
    return best


def _retype_strings(df):
    """Re-derive column types after an all-string widened parse (the
    fill=TRUE widest-row path reads every column as string because the
    widened schema is built before Spark's inference can see it): one
    aggregate pass counts, per column, non-null values that fail
    try_cast to bigint / to double; columns with zero failures cast to
    the narrowest clean type. Exact (whole column, not sampled — the
    repo rule for type promises)."""
    from pyspark.sql import functions as _F

    cols = [f.name for f in df.schema.fields
            if isinstance(f.dataType, T.StringType)]
    if not cols:
        return df
    aggs = []
    for c in cols:
        nn = _F.col(c).isNotNull()
        aggs.append(_F.sum(nn.cast("int")).alias(f"nn_{c}"))
        aggs.append(
            _F.sum(
                (nn & _F.col(c).try_cast("bigint").isNull()).cast("int")
            ).alias(f"bl_{c}")
        )
        aggs.append(
            _F.sum(
                (nn & _F.col(c).try_cast("double").isNull()).cast("int")
            ).alias(f"bd_{c}")
        )
    row = df.agg(*aggs).collect()[0]
    casts = {}
    for c in cols:
        if not row[f"nn_{c}"]:
            continue
        if row[f"bl_{c}"] == 0:
            casts[c] = _F.col(c).cast("bigint")
        elif row[f"bd_{c}"] == 0:
            casts[c] = _F.col(c).cast("double")
    return df.withColumns(casts) if casts else df


def _looks_numeric(tok: str) -> bool:
    try:
        float(tok)
        return True
    except ValueError:
        return False


def _unzip_to_tmp(path: str) -> str:
    """Driver-side unpack of a .zip archive (reference R/fread.R:1-35
    reopens compressed input through a decompressing connection; zip
    archives — unlike gz/bz2 — have no Hadoop codec, so the reference's
    single-file rule applies: exactly one member, extracted to a temp
    dir keyed by content). A 100 TB pipeline should land gz shards or
    parquet instead; this is the small-file compatibility path."""
    import hashlib
    import os
    import zipfile

    with zipfile.ZipFile(path) as zf:
        members = [m for m in zf.namelist() if not m.endswith("/")]
        if len(members) != 1:
            raise ValueError(
                f"fread: zip archive must contain exactly one file, got"
                f" {members}"
            )
        tag = hashlib.md5(
            (path + str(os.path.getmtime(path))).encode()
        ).hexdigest()
        out_dir = f"/root/repo/.tmp/fread_zip/{tag}"
        os.makedirs(out_dir, exist_ok=True)
        out = os.path.join(out_dir, os.path.basename(members[0]))
        if not os.path.exists(out):
            with zf.open(members[0]) as src, open(out, "wb") as dst:
                dst.write(src.read())
        return out


def _read_csvy_header(path: str, encoding: str) -> tuple[dict, int]:
    """Parse a CSVY YAML front-matter block (reference R/fread.R yaml
    arg; format per csvy.org: a `---` ... `---` block before the csv
    data). Returns (metadata dict, number of header lines to skip).
    Driver-side single-file read — the front matter is at most a few KB
    at the head of the file."""
    import glob
    import os

    import yaml as _yaml

    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "part-*.csv*")))
        if len(parts) != 1:
            raise ValueError(
                f"fread(yaml=True) on a directory needs exactly one part"
                f" file, got {parts}"
            )
        path = parts[0]
    with open(path, encoding=encoding) as fh:
        first = fh.readline().rstrip("\r\n").lstrip("﻿")
        if first != "---":
            raise ValueError(
                "fread(yaml=True): file does not start with a '---' YAML"
                " front-matter line"
            )
        lines = []
        n = 1
        for ln in fh:
            n += 1
            if ln.rstrip("\r\n") == "---":
                break
            lines.append(ln)
        else:
            raise ValueError(
                "fread(yaml=True): unterminated YAML front matter"
            )
    meta = _yaml.safe_load("".join(lines)) or {}
    return meta, n


def _detect_header(sample: list[str], sep: str) -> bool:
    """header="auto": first row is a header when none of its fields parse
    as numbers but a later row has at least one numeric field (fread's
    rule of thumb, src/fread.c header detection)."""
    if not sample:
        return True
    first = sample[0].split(sep)
    if any(_looks_numeric(t) for t in first):
        return False
    for line in sample[1:]:
        if any(_looks_numeric(t) for t in line.split(sep)):
            return True
    return True


def fread(
    spark: SparkSession,
    path: str | None = None,
    sep: str = "auto",
    header: bool | str = "auto",
    nrows: int | None = None,
    select: Sequence[str] | None = None,
    drop: Sequence[str] | None = None,
    col_classes: Mapping[str, str] | None = None,
    col_names: Sequence[str] | None = None,
    na_strings: Sequence[str] = ("",),
    skip: int | str = "auto",
    quote: str = '"',
    fill: bool = False,
    encoding: str = "UTF-8",
    key: Sequence[str] | None = None,
    text: str | None = None,
    cmd: str | None = None,
    dec: str = "auto",
    multiline: bool = False,
    yaml: bool = False,
    strip_white: bool = True,
    logical01: bool = False,
    blank_lines_skip: bool = True,
    line_sep: str | None = None,
    comment_char: str | None = None,
) -> DT:
    """Read a CSV/TSV into a DT. See module docstring for the mapping.

    ``blank_lines_skip=True`` (default) drops blank LINES before the
    parse (utf-8 line path; see the inline note for why the reference's
    stop-at-blank FALSE default is not expressible distributed);
    ``fill=True`` widens to the WIDEST row with V-named extra columns
    and re-derives types exactly (one counting pass + one aggregate).
    ``text=`` (reference R/fread.R `text` arg) parses a literal string;
    ``cmd=`` (R/fread.R `cmd` arg) runs a shell command and parses its
    stdout — a DRIVER-side convenience for preprocessed local input,
    not a distributed source (at scale, land the data and use file
    splits); ``dec=","`` (European decimals) reads affected columns as
    strings and casts after comma->dot normalization (Spark's csv
    parser is dot-only); ``comment_char=`` (reference R/fread.R
    comment.char, tests.Rraw 2341) drops full lines STARTING with the
    character — Spark's native csv ``comment`` option, so the scan
    stays native; comment lines are also excluded from the sep/header
    sniff sample and never count toward ``nrows``."""
    if comment_char is not None:
        if not isinstance(comment_char, str) or len(comment_char) != 1:
            raise ValueError(
                "comment.char= must be a single non-NA character"
            )
        if comment_char == quote:
            raise ValueError("comment.char= must differ from quote=")
    if cmd is not None:
        import subprocess

        res = subprocess.run(
            cmd, shell=True, capture_output=True, check=True
        )
        text = res.stdout.decode(encoding)
    if text is not None:
        import hashlib as _hl
        import os as _os

        _os.makedirs("/root/repo/.tmp/fread_text", exist_ok=True)
        path = "/root/repo/.tmp/fread_text/" + _hl.md5(
            text.encode()
        ).hexdigest() + ".csv"
        with open(path, "w", encoding=encoding) as fh:
            fh.write(text)
    if path is None:
        raise ValueError("fread needs a path, or text=")
    if path.endswith(".zip"):
        path = _unzip_to_tmp(path)
    auto_skip = False
    if skip == "auto":
        # reference default: find the data block start during the
        # sample pass below (non-tabular prologue lines are skipped).
        # Detection only runs when a sample is taken (sep/header auto);
        # with both passed explicitly the read starts at line 1.
        auto_skip = True
        skip = 0
    if isinstance(skip, str):
        # skip="string" (reference R/fread.R skip arg: "the full line
        # containing that string becomes the first line read"): resolve
        # to a line index with one distributed substring scan — only
        # the matching MIN index returns to the driver, so the probe is
        # a column-less aggregate, not a collect, at any scale.
        needle = skip
        matches = (
            spark.sparkContext.textFile(path)
            .zipWithIndex()
            .filter(lambda t, _n=needle: _n in t[0])
            .map(lambda t: t[1])
        )
        try:
            skip = matches.min()
        except ValueError:
            raise ValueError(
                f"fread: skip={needle!r} not found in any line of {path}"
            ) from None
    if yaml:
        # CSVY: YAML front matter carries names/types/sep; the block is
        # skipped before the distributed parse (reference R/fread.R yaml
        # arg; fwrite(yaml=True) writes the same format).
        meta, n_head = _read_csvy_header(path, encoding)
        skip = skip + n_head
        fields_meta = (meta.get("schema") or {}).get("fields") or []
        if fields_meta and col_names is None:
            col_names = [str(f["name"]) for f in fields_meta]
        if fields_meta and col_classes is None:
            col_classes = {
                str(f["name"]): str(f.get("type", "string"))
                for f in fields_meta
            }
        if sep == "auto" and meta.get("sep"):
            sep = str(meta["sep"])
        if header == "auto" and "header" in meta:
            header = bool(meta["header"])
    if dec == ",":
        # Spark's csv parser is dot-only, so comma decimals are read as
        # strings and normalized , -> . before the double cast.
        want = dict(col_classes or {})
        back = fread(
            spark, path, sep=sep, header=header, nrows=nrows,
            select=select, drop=drop,
            col_classes={k: "character" for k in want} if want else None,
            col_names=col_names, na_strings=na_strings, skip=skip,
            quote=quote, fill=fill, encoding=encoding, key=key,
            strip_white=strip_white, logical01=logical01, dec=".",
            comment_char=comment_char, multiline=multiline,
            blank_lines_skip=blank_lines_skip, line_sep=line_sep,
        )
        from pyspark.sql import functions as _F

        df = back.df
        if want:
            for name, cls in want.items():
                t = _TYPE_MAP.get(cls, T.StringType())
                if not isinstance(t, T.StringType):
                    df = df.withColumn(
                        name,
                        _F.regexp_replace(name, ",", ".").cast(t),
                    )
            return DT(df, key=key)
        # No col_classes (the reference's auto-detected dec=',' path,
        # tests.Rraw 2256): Spark's inference already typed dot-clean
        # columns; remaining STRING columns whose every non-null value
        # is a comma-decimal/plain number (with at least one actual
        # comma) become double. One exact aggregate pass, the repo rule
        # for type promises (same posture as _retype_strings).
        strc = [f.name for f in df.schema.fields
                if isinstance(f.dataType, T.StringType)]
        if strc:
            num_re = r"^[+-]?([0-9]+|[0-9]*,[0-9]+)([eE][+-]?[0-9]+)?$"
            aggs = []
            for c in strc:
                nn = _F.col(c).isNotNull()
                aggs.append(_F.sum(nn.cast("int")).alias(f"nn_{c}"))
                aggs.append(_F.sum(
                    (nn & ~_F.col(c).rlike(num_re)).cast("int")
                ).alias(f"bad_{c}"))
                aggs.append(_F.sum(
                    _F.col(c).contains(",").cast("int")
                ).alias(f"com_{c}"))
            row = df.agg(*aggs).collect()[0]
            casts = {
                c: _F.regexp_replace(c, ",", ".").cast("double")
                for c in strc
                if row[f"nn_{c}"] and not row[f"bad_{c}"]
                and row[f"com_{c}"]
            }
            if casts:
                df = df.withColumns(casts)
        return DT(df, key=key)
    if encoding == "UTF-8" and not path.endswith((".gz", ".bz2", ".zst")):
        # BOM-based charset sniff (reference src/fread.c:~1370 detects
        # UTF-16 BOMs — and errors — and the GB-18030 signature with a
        # warning; here both simply switch the decoder). Only for a
        # single local uncompressed file under the default encoding.
        import os as _os

        if _os.path.isfile(path):
            with open(path, "rb") as _fh:
                head4 = _fh.read(4)
            if head4 == b"\xff\xfe\x00\x00":
                # must test BEFORE UTF-16LE: the UTF-32LE BOM starts
                # with the UTF-16LE one (the silent-garbage fallthrough
                # the r9 ADVICE flagged; reference detects-and-errors,
                # here both simply decode)
                encoding = "UTF-32LE"
            elif head4 == b"\x00\x00\xfe\xff":
                encoding = "UTF-32BE"
            elif head4[:2] == b"\xff\xfe":
                encoding = "UTF-16LE"
            elif head4[:2] == b"\xfe\xff":
                encoding = "UTF-16BE"
            elif head4 == b"\x84\x31\x95\x33":
                encoding = "GB18030"
    _SPARK_CHARSETS = {
        "utf8", "utf16", "utf16le", "utf16be", "utf32", "iso88591",
        "usascii",
    }
    if (
        encoding.lower().replace("-", "").replace("_", "")
        not in _SPARK_CHARSETS
    ):
        # Spark's csv reader whitelists a handful of charsets; anything
        # else (GB18030, Shift_JIS, UTF-32, ...) is transcoded to a
        # UTF-8 temp file driver-side — a single-local-file
        # compatibility path, like the reference's connection-based
        # re-encoding. Land UTF-8 shards for distributed reads at
        # scale. Temp dir: $DATA_TABLE_SPARK_TMPDIR, else the system
        # tempfile dir; the transcode STREAMS in 1 MiB text chunks
        # (text-mode read handles multibyte boundaries) so the file
        # never has to fit in driver memory.
        import hashlib as _hl
        import os as _os
        import tempfile as _tf

        if not _os.path.isfile(path):
            raise ValueError(
                f"fread: encoding={encoding!r} is outside Spark's csv"
                " charset set and transcoding needs a single local file"
            )
        _tmp = _os.path.join(
            _os.environ.get("DATA_TABLE_SPARK_TMPDIR", _tf.gettempdir()),
            "fread_enc",
        )
        _os.makedirs(_tmp, exist_ok=True)
        out_path = _os.path.join(
            _tmp,
            _hl.md5((path + encoding).encode()).hexdigest() + ".csv",
        )
        # write-then-rename: a concurrent fread of the same file (or a
        # lazy Spark scan racing a rewrite) must only ever see a
        # complete UTF-8 file, so stream into a unique temp name in the
        # same dir and atomically os.replace() onto the md5 name
        _fd, _part = _tf.mkstemp(dir=_tmp, suffix=".csv.part")
        try:
            with open(path, encoding=encoding) as _src, _os.fdopen(
                _fd, "w", encoding="utf-8"
            ) as _dst:
                while True:
                    _chunk = _src.read(1 << 20)
                    if not _chunk:
                        break
                    _dst.write(_chunk)
            _os.replace(_part, out_path)
        except BaseException:
            try:
                _os.unlink(_part)
            except OSError:
                pass
            raise
        path = out_path
        encoding = "UTF-8"
    scalar_class = None
    if isinstance(col_classes, str):
        # reference colClasses="character" form: ONE class for every
        # column (R/fread.R colClasses unnamed-scalar recycling). For
        # "character" this just disables inference (csv's native type);
        # other classes cast post-read.
        scalar_class = col_classes
        col_classes = None
    fill_short_rows = False
    nul_strip = False
    if sep == "auto" or header == "auto" or (
        dec == "auto" and sep != ","
    ):
        # tiny driver-side sample (the reference samples on the driver
        # thread too before the parallel pass). The text datasource is
        # UTF-8-only, so other encodings sample via a local open() —
        # auto-detection on a non-UTF-8 directory/glob falls back to
        # defaults (pass sep/header explicitly there).
        if encoding.upper().replace("-", "").replace("_", "") == "UTF8":
            sample_rows = spark.read.text(path).limit(50 + skip).collect()
            sample = [r[0] for r in sample_rows][skip:]
            if (
                line_sep is None
                and len(sample_rows) == 1
                and "\r" in sample_rows[0][0]
            ):
                # \r-ONLY line endings (classic-Mac artifact; reference
                # src/fread.c eol detection handles \r alone): Hadoop's
                # line reader only splits \n / \r\n, so the whole file
                # arrived as one "line". Re-split the sample and read
                # data through an explicit lineSep below.
                line_sep = "\r"
                sample = sample_rows[0][0].split("\r")[skip:][:50]
        else:
            try:
                with open(path, encoding=encoding) as fh:
                    sample = [ln.rstrip("\r\n") for ln in fh.readlines()[skip:skip + 50]]
            except OSError:
                sample = []
        sample = [ln.lstrip("﻿") for ln in sample]
        if comment_char is not None:
            # comment lines never participate in sep/header sniffing
            # (tests.Rraw 2341.14: a comment line above the header)
            sample = [
                ln for ln in sample if not ln.startswith(comment_char)
            ]
        nul_strip = any("\x00" in ln for ln in sample)
        if sep == "auto":
            sep = _detect_sep(sample)
            if sep == " ":
                # AUTO-detected space sep always parses as whitespace
                # RUNS (read.table semantics): aligned-column layouts
                # pad fields with blank runs, and a single trailing
                # blank would otherwise fabricate an empty field
                # (reference fread reaches the same result via its
                # strip.white space-sep path; tests.Rraw 1555.01/900.1
                # pin it against read.table). Pass sep=" " explicitly
                # for a literal single-space separator.
                import re as _re

                counts = {
                    len(_re.split(r"\s+", ln.strip()))
                    for ln in sample
                    if ln.strip()
                }
                if counts and (min(counts) >= 2 or counts == {1}):
                    # {1}: no internal separator at all — the blanks
                    # are trailing pad, a single-column file (reference
                    # falls back to sep="\n" here, src/fread.c:1610)
                    sep = r"\s+"
        if dec == "auto":
            # dec auto-detection (reference src/fread.c:1322-1371,
            # 2167 and tests.Rraw 2256): per sampled field, balance
            # dot-decimal vs comma-decimal parses; ties go to '.';
            # never attempted when sep==',' (src/fread.c:2058)
            import csv as _csv
            import re as _re

            dot_re = _re.compile(
                r"^[+-]?[0-9]*\.[0-9]+([eE][+-]?[0-9]+)?$")
            com_re = _re.compile(
                r"^[+-]?[0-9]*,[0-9]+([eE][+-]?[0-9]+)?$")
            balance = 0
            if sep not in (",", r"\s+"):
                for ln in sample:
                    if not ln.strip():
                        continue
                    try:
                        toks = next(_csv.reader(
                            [ln], delimiter=sep, quotechar=quote or '"'
                        ))
                    except Exception:
                        toks = ln.split(sep)
                    for tok in toks:
                        t = tok.strip()
                        if dot_re.match(t):
                            balance += 1
                        elif com_re.match(t):
                            balance -= 1
            dec = "," if balance < 0 else "."
            if dec == ",":
                # re-enter through the comma-decimal branch above with
                # everything now resolved
                return fread(
                    spark, path, sep=sep, header=header, nrows=nrows,
                    select=select, drop=drop, col_classes=col_classes,
                    col_names=col_names, na_strings=na_strings,
                    # a yaml front-matter count is already folded into
                    # skip — don't revert it to "auto"
                    skip="auto" if auto_skip and not yaml else skip,
                    quote=quote,
                    fill=fill, encoding=encoding, key=key, dec=",",
                    strip_white=strip_white, logical01=logical01,
                    comment_char=comment_char, multiline=multiline,
                    blank_lines_skip=blank_lines_skip, line_sep=line_sep,
                )
        if auto_skip and sample and not fill and not multiline:
            # skip="auto" (reference default; src/fread.c jumps to the
            # block of consistent-field-count lines): start the read
            # where the MODE-count block begins, so a non-tabular
            # prologue (report titles, notes) is dropped. Gated off
            # under fill= (ragged rows ARE the data) and multiline=
            # (sampled physical lines split records mid-quote).
            import csv as _csv
            import re as _re

            def _count(ln: str) -> int:
                if not ln.strip():
                    return 0
                if sep == r"\s+":
                    return len(_re.split(r"\s+", ln.strip()))
                try:
                    return len(
                        next(
                            _csv.reader(
                                [ln], delimiter=sep, quotechar=quote or '"'
                            )
                        )
                    )
                except Exception:
                    return ln.count(sep) + 1

            counts = [_count(ln) for ln in sample]
            nz = [c for c in counts if c > 0]
            # tie-break toward the WIDER count: a prologue as long as
            # the sampled data block must not win the mode
            mode = (
                max(set(nz), key=lambda c: (nz.count(c), c)) if nz else 0
            )
            block = 0
            if mode >= 2:
                for i in range(len(counts)):
                    if counts[i] != mode:
                        continue
                    nxt = next((c for c in counts[i + 1:] if c > 0), mode)
                    if nxt == mode:
                        block = i
                        break
            if block:
                if header is not False:
                    # one look-back: a narrower non-blank line directly
                    # above the block is the column-name row (the
                    # header/data width reconciliation below pads it
                    # out; tests.Rraw 1867.05/.07). Skipped when the
                    # caller declared header=False — there is no name
                    # row to rescue.
                    j = block - 1
                    while j >= 0 and counts[j] == 0:
                        j -= 1
                    if j >= 0 and 2 <= counts[j] < mode:
                        block = j
                skip = skip + block
                sample = sample[block:]
        if header == "auto":
            if sep == r"\s+":
                import re as _re

                header = _detect_header(
                    [
                        _re.sub(r"\s+", "\x1f", ln.strip())
                        for ln in sample
                        if ln.strip()
                    ],
                    "\x1f",
                )
            else:
                header = _detect_header(sample, sep)
        if header is True and not col_names and not fill:
            # header/data width reconciliation (reference src/fread.c
            # header logic, tests.Rraw 1867.02-.08 + 903): a header one
            # field NARROWER than the data is guessed to be row names
            # (V1 pads the FRONT); narrower by more pads default names
            # at the END; a header WIDER than the data null-fills the
            # short rows automatically (PERMISSIVE).
            import csv as _csv

            def _fields(ln: str) -> list[str]:
                if sep == r"\s+":
                    import re as _re

                    return _re.split(r"\s+", ln.strip())
                try:
                    return next(
                        _csv.reader([ln], delimiter=sep, quotechar=quote or '"')
                    )
                except Exception:
                    return ln.split(sep)

            nonblank = [ln for ln in sample if ln.strip()]
            if len(nonblank) >= 2:
                hdr_fields = [f.strip() for f in _fields(nonblank[0])]
                data_counts = [len(_fields(ln)) for ln in nonblank[1:]]
                n_h, n_d = len(hdr_fields), max(
                    set(data_counts),
                    key=lambda c: (data_counts.count(c), c),
                )
                if n_d > n_h:
                    if n_d - n_h == 1:
                        col_names = ["V1"] + hdr_fields
                    else:
                        col_names = hdr_fields + [
                            f"V{i + 1}" for i in range(n_h, n_d)
                        ]
                    # parse headerless over the data lines only; the
                    # explicit names land via the col_names path below
                    header = False
                    skip = skip + 1
                elif n_h > n_d:
                    fill_short_rows = True

    multiline_charset = encoding.upper().startswith(("UTF-16", "UTF-32", "UTF16", "UTF32"))
    # whitespace-run separator (sep=r"\s+", auto-detected above or
    # passed explicitly): lines are collapsed to a \x1f-separated form
    # below and parsed with that sentinel as the csv sep. The collapse
    # is not quote-stateful — aligned-column files are unquoted by
    # construction (they come from fixed-width writers).
    ws_mode = sep in (r"\s+", "whitespace")
    csv_sep = "\x1f" if ws_mode else sep
    reader = (
        spark.read.option("sep", csv_sep)
        .option("header", str(bool(header)).lower())
        .option("quote", quote)
        .option("encoding", encoding)
        # per-file (multiLine) parser path: required for multi-byte
        # charsets (the default line splitter assumes single-byte
        # newlines) and for quoted fields with embedded newlines
        # (multiline=True; reference parses those natively). Costs file-
        # granularity parallelism — at 100 TB store many shards.
        .option("multiLine", "true" if (multiline or multiline_charset) else "false")
        .option("escape", '"')
        # nrows= is a post-parse limit (a distributed scan cannot stop
        # mid-file the way the reference's streaming parser does), so
        # a malformed line PAST the requested rows must not abort the
        # read -> PERMISSIVE when nrows is given
        .option(
            "mode",
            "PERMISSIVE"
            if (fill or fill_short_rows or nrows is not None)
            else "FAILFAST",
        )
        # strip.white (reference R/fread.R:40, default TRUE): Spark's
        # csv reader keeps surrounding field whitespace by default
        .option("ignoreLeadingWhiteSpace", "true" if strip_white else "false")
        .option("ignoreTrailingWhiteSpace", "true" if strip_white else "false")
        .option("nullValue", na_strings[0] if na_strings else "")
        # accepts both "yyyy-MM-dd HH:mm:ss.SSSSSS" and fwrite's ISO
        # "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'" via optional sections
        .option(
            "timestampFormat",
            "yyyy-MM-dd[['T'][ ]HH:mm:ss[.SSSSSS][.SSS]['Z']]",
        )
    )
    if comment_char is not None:
        if sep == comment_char:
            raise ValueError(
                "comment.char= must differ from sep="
            )
        # native Spark csv option: full lines starting with the char
        # are skipped by the scan itself (no extra pass; comments never
        # count toward nrows because they never become rows)
        reader = reader.option("comment", comment_char)
    lines = None
    utf8 = encoding.upper().replace("-", "").replace("_", "") == "UTF8"
    line_path = not (multiline or multiline_charset)

    def _line_rdd():
        if line_sep:
            return (
                spark.read.option("lineSep", line_sep)
                .text(path)
                .rdd.map(lambda r: r[0])
            )
        return spark.sparkContext.textFile(path)

    if line_sep and line_path:
        # a non-default line terminator never reaches the native csv
        # scan correctly; always go through the line RDD
        lines = _line_rdd()
    if skip and line_path:
        # OSS Spark's csv reader has no skip-lines option (CSVOptions
        # has none; unknown options are silently ignored), so feed the
        # reader an RDD of lines with the first `skip` dropped.
        # zipWithIndex follows file order for a single file; for a
        # directory the skip applies to the concatenated file order.
        lines = (
            (lines if lines is not None else _line_rdd())
            .zipWithIndex()
            .filter(lambda t: t[1] >= skip)
            .map(lambda t: t[0])
        )
    if blank_lines_skip and line_path and utf8:
        # blank.lines.skip: the reference's FALSE default stops the
        # read at the first interior blank line (with a warning) and
        # silently drops trailing ones — neither is expressible in a
        # distributed scan, and Spark's own behavior (a null row per
        # blank line) matches nothing a reference user expects, so the
        # default here is True: drop blank LINES before parsing. Costs
        # the native file scan (line-RDD input); pass
        # blank_lines_skip=False on guaranteed-clean input to keep it.
        lines = (
            lines if lines is not None else _line_rdd()
        ).filter(lambda ln: ln.strip() != "")
    if line_path and (nul_strip or lines is not None):
        # embedded NUL bytes (reference src/fread.c skips them ANYWHERE
        # in the file, tests.Rraw 2025.x): strip before parse. Applied
        # unconditionally whenever a line RDD is already materialized —
        # one cheap str.replace per line, and the default
        # blank_lines_skip path always materializes one, so NULs past
        # the 50-line driver sample (or in reads with explicit
        # sep+header, which take no sample at all) are still stripped
        # (r9 ADVICE). The sample gate only decides whether a NUL alone
        # FORCES the line-RDD path. Residual documented gap: explicit
        # sep+header WITH blank_lines_skip=False keeps the native csv
        # scan, where unsampled NULs reach the parser unstripped —
        # stripping there would cost every clean read its native scan.
        lines = (lines if lines is not None else _line_rdd()).map(
            lambda ln: ln.replace("\x00", "")
        )
    if comment_char is not None and line_path and (
        lines is not None or nrows is not None
    ):
        # whenever a line RDD is (or must be) materialized, drop
        # comment lines there too so line-counted features (nrows=,
        # fill width derivation) never count them (tests.Rraw 2341.15);
        # the native-scan path needs no filter — the csv comment
        # option skips them at parse
        lines = (lines if lines is not None else _line_rdd()).filter(
            lambda ln, _c=comment_char: not ln.startswith(_c)
        )
    if ws_mode and line_path:
        import re as _re

        base = lines if lines is not None else _line_rdd()
        lines = base.map(lambda ln: _re.sub(r"\s+", "\x1f", ln.strip()))
    if nrows is not None and lines is not None:
        # restrict BEFORE parse/inference: the reference's streaming
        # parser never reads past nrows, so a ragged/malformed tail
        # must neither error the read nor contaminate inferred types
        keep = nrows + (1 if header else 0)
        lines = (
            lines.zipWithIndex()
            .filter(lambda t: t[1] < keep)
            .map(lambda t: t[0])
        )

    widened = None
    if fill and lines is not None and not col_classes and not col_names:
        # fill=TRUE widens to the WIDEST row (reference R/fread.R fill;
        # src/fread.c samples max ncol): rows wider than the first line
        # would otherwise be silently truncated by the first-row-width
        # schema. Extra columns get default names V{k} (reference
        # "Added N extra default column names at the end"). One extra
        # counting pass over the lines; types re-derived below.
        import csv as _csv

        def _nf(ln: str, _sep=csv_sep, _q=quote) -> int:
            if not _q:
                return len(ln.split(_sep))
            try:
                return len(next(_csv.reader([ln], delimiter=_sep, quotechar=_q)))
            except Exception:
                return ln.count(_sep) + 1

        n_max = lines.map(_nf).max()
        first_line = lines.first()
        head_fields = (
            first_line.split(csv_sep)
            if not quote
            else next(_csv.reader([first_line], delimiter=csv_sep, quotechar=quote))
        )
        if n_max > len(head_fields):
            if header:
                base = [str(x) for x in head_fields]
                # drop the header line from the data RDD (the explicit
                # schema below disables Spark's own header handling)
                lines = (
                    lines.zipWithIndex()
                    .filter(lambda t: t[1] >= 1)
                    .map(lambda t: t[0])
                )
            else:
                base = []
            names = base + [
                f"V{i + 1}" for i in range(len(base), n_max)
            ]
            # sanitize: empty header tokens (e.g. a multi-space header
            # under a literal single-char sep) and duplicates would be
            # unreferenceable columns
            seen: dict[str, int] = {}
            clean = []
            for i, nm in enumerate(names):
                nm = nm.strip() or f"V{i + 1}"
                if nm in seen:
                    seen[nm] += 1
                    nm = f"{nm}.{seen[nm]}"
                else:
                    seen[nm] = 0
                clean.append(nm)
            widened = T.StructType(
                [T.StructField(nm, T.StringType(), True) for nm in clean]
            )
    if widened is not None:
        deferred_casts = {}
        reader = reader.schema(widened).option("header", "false")
    elif col_classes:
        # colClasses is a PARTIAL override (reference R/fread.R:42:
        # "used rarely to override the detected types, of particular
        # columns"): infer the full schema first (inference is its own
        # pass regardless), then replace only the named fields. A full-
        # schema replacement would silently drop/misparse every
        # undeclared column.
        probe = reader.option("inferSchema", "true")
        inferred = (probe.csv(lines) if lines is not None else probe.csv(path)).schema
        names = list(col_names) if col_names else [f.name for f in inferred.fields]
        if len(names) != len(inferred.fields):
            raise ValueError(
                f"col_names has {len(names)} entries for"
                f" {len(inferred.fields)} detected columns"
            )
        unknown = set(col_classes) - set(names)
        if unknown:
            raise ValueError(f"col_classes for unknown columns: {sorted(unknown)}")
        deferred_casts: dict[str, T.DataType] = {}
        fields = []
        for nm, fld in zip(names, inferred.fields):
            if nm in col_classes:
                target = _TYPE_MAP.get(col_classes[nm], T.StringType())
                if len(na_strings) > 1 and not isinstance(target, T.StringType):
                    # extra na tokens would FAILFAST a typed parse; read
                    # as string, nullify, cast below
                    deferred_casts[nm] = target
                    target = T.StringType()
                fields.append(T.StructField(nm, target, True))
            else:
                fields.append(T.StructField(nm, fld.dataType, True))
        reader = reader.schema(T.StructType(fields))
    elif scalar_class is not None:
        deferred_casts = {}
        # no inference: every column parses as string; non-character
        # scalar classes cast below once names are settled
        reader = reader.option("inferSchema", "false")
    else:
        deferred_casts = {}
        reader = reader.option("inferSchema", "true")
    df = reader.csv(lines) if lines is not None else reader.csv(path)
    if scalar_class is not None and scalar_class != "character":
        from pyspark.sql import functions as _F

        t = _TYPE_MAP.get(scalar_class, T.StringType())
        df = df.withColumns({c: _F.col(c).cast(t) for c in df.columns})
    if df.columns and df.columns[0].startswith("﻿"):
        # UTF-8 BOM survives into the first header name (the csv parser
        # does not strip it); normalize like the reference does
        df = df.withColumnRenamed(df.columns[0], df.columns[0].lstrip("﻿"))
    if widened is not None:
        df = _retype_strings(df)
    if not header and not col_names and all(
        c == f"_c{i}" for i, c in enumerate(df.columns)
    ):
        # the reference's default names for headerless input: V1..Vn
        df = df.toDF(*[f"V{i + 1}" for i in range(len(df.columns))])
    if col_names and not col_classes:  # schema path already named them
        df = df.toDF(*col_names)
    if len(na_strings) > 1:
        # Spark's csv nullValue is single-valued; normalize the rest
        # post-read. String columns nullify by match; typed columns
        # already yielded null when the token failed their parse/cast.
        from pyspark.sql import functions as _F

        extra = [s for s in na_strings[1:]]
        updates = {
            fld.name: _F.when(
                _F.col(fld.name).isin(extra), _F.lit(None)
            ).otherwise(_F.col(fld.name))
            for fld in df.schema.fields
            if isinstance(fld.dataType, T.StringType)
        }
        if updates:
            df = df.withColumns(updates)
    if deferred_casts:
        from pyspark.sql import functions as _F

        df = df.withColumns(
            {nm: _F.col(nm).cast(t) for nm, t in deferred_casts.items()}
        )
    if select:
        df = df.select(*select)
    elif drop:
        df = df.drop(*drop)
    if nrows is not None:
        df = df.limit(nrows)
    if logical01:
        # logical01 (reference R/fread.R:41, src/fread.c type bumping):
        # integer columns holding only 0/1/NA read as logical. The
        # reference decides during its sampled parse; distributed
        # equivalent is one min/max aggregate over the parsed frame
        # (exact, not sampled — a sample-based promise could be wrong
        # at the 100 TB tail).
        from pyspark.sql import functions as _F

        int_cols = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, (T.IntegerType, T.LongType))
            and f.name not in (col_classes or {})
        ]
        if int_cols:
            stats = df.agg(
                *[_F.min(c).alias(f"mn_{c}") for c in int_cols],
                *[_F.max(c).alias(f"mx_{c}") for c in int_cols],
            ).collect()[0]
            bool_cols = {
                c: _F.col(c).cast(T.BooleanType())
                for c in int_cols
                if stats[f"mn_{c}"] is not None
                and stats[f"mn_{c}"] >= 0 and stats[f"mx_{c}"] <= 1
            }
            if bool_cols:
                df = df.withColumns(bool_cols)
    return DT(df, key=key)


def fread_parquet(
    spark: SparkSession, path: str, key: Sequence[str] | None = None
) -> DT:
    """Parquet ingest (the testdata path; fread has no parquet but this
    is the 100 TB-native source: column pruning + predicate pushdown +
    partition pruning all reach the scan)."""
    return DT(spark.read.parquet(path), key=key)


def fread_jsonl(spark: SparkSession, path: str, schema=None) -> DT:
    """JSON-lines ingest. Pass an explicit `schema` (DDL string or
    StructType) for production reads: schema inference is a full extra
    pass over the data and types drift with content — at 100 TB the
    inference pass alone is the cost of the job."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return DT(r.json(path))


def fread_orc(spark: SparkSession, path: str, key: Sequence[str] | None = None) -> DT:
    """ORC ingest — vectorized reader with column pruning + predicate
    pushdown reaching the scan, same as parquet."""
    return DT(spark.read.orc(path), key=key)
