"""File-inventory source (S1-S5, ``src/DataWarehouse.js:32-63``).

The reference builds its inventory from chokidar watcher events: one row
per ``*.shp`` file with relative path, md5, size and inode.  The Spark
expression is the built-in ``binaryFile`` source — recursive listing,
suffix predicate pushed into the scan via ``pathGlobFilter`` (the
reference pushed it by hand at ``:34``), content hashing as a JVM-side
``F.md5`` over the bytes.

At 100 TB the same plan holds: binaryFile splits the listing across
executors, the glob prunes before any byte is read, and the md5 is
computed where the data lives (no driver I/O, unlike the reference's
one-file-at-a-time ``md5File`` at ``:44``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Inventory schema (FIXTURES.md B / ref ``:48-56``).
FILE_COLUMNS = ("file", "md5", "size", "ino")

#: binaryFile's fixed schema — required explicitly by the streaming reader.
_BINARY_FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), True),
        T.StructField("modificationTime", T.TimestampType(), True),
        T.StructField("length", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)


# characters Hadoop's GlobFilter treats specially ("," only inside {}
# alternation — included anyway; an over-wide listing is always safe here)
_GLOB_SPECIALS = set("*?[]{}\\,")


def _ci_glob(suffix: str) -> str:
    """Case-insensitive glob for a suffix — ``.shp`` → ``*.[sS][hH][pP]``.

    Keeps the predicate pushed into the *listing* (no file opened, no row
    produced for non-matches) while matching the reference's
    case-insensitive admit (``:34`` lowercases before testing).

    The glob only needs to be a SUPERSET of the admit rule —
    :func:`_inventory` re-checks ``lower(path).endswith(lower(suffix))``
    exactly — so characters the simple ``[xX]`` class can't express
    safely degrade to ``?`` (any one char) instead of producing a wrong
    or broken pattern: letters with multi-char or asymmetric case
    mappings (``ß``.upper() == ``SS``; Turkish ``İ``), letters whose
    case variants aren't mutually reachable via lower/upper alone, and
    glob metacharacters appearing literally in the suffix.  The cost of
    ``?`` is listing (and reading) near-miss files that the exact filter
    then drops — IO, never correctness.
    """
    out = []
    for ch in suffix:
        lo, up = ch.lower(), ch.upper()
        if (
            ch.isalpha()
            and lo != up
            and len(lo) == 1
            and len(up) == 1
            # the class must re-admit the char itself, and round-trip:
            # a file char c matches the admit rule iff c.lower() ==
            # lo — for c ∈ {lo, up} that needs up.lower() == lo
            and ch in (lo, up)
            and up.lower() == lo
            and not ({lo, up} & _GLOB_SPECIALS)
        ):
            out.append(f"[{lo}{up}]")
        elif ch not in _GLOB_SPECIALS and lo == up:
            out.append(ch)
        else:
            out.append("?")
    return "*" + "".join(out)


def _inventory(df: DataFrame, root: str, suffix: str) -> DataFrame:
    """Project binaryFile rows to the reference's inventory shape."""
    rel = F.regexp_replace(
        F.col("path"), "^file:" + re.escape(root.rstrip("/")) + "/?", ""
    )
    return (
        df
        # glob matched case-sensitively upstream; keep the reference's
        # case-insensitive guard (ref :34 lowercases before testing)
        .filter(F.lower(F.col("path")).endswith(suffix.lower()))
        .select(
            rel.alias("file"),
            F.md5(F.col("content")).alias("md5"),
            F.col("length").alias("size"),
            # no portable inode through binaryFile: a stable surrogate id
            # derived from the absolute path (collision-safe enough for
            # identity; the reference only uses ino as an opaque id)
            F.xxhash64(F.col("path")).alias("ino"),
        )
    )


def scan_files(
    spark: SparkSession,
    root: str,
    suffix: str = ".shp",
) -> DataFrame:
    """Batch snapshot scan of a directory tree (S1 batch mode).

    Returns ``(file, md5, size, ino)`` with ``file`` relative to
    ``root`` (S5, ref ``:38``).
    """
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", _ci_glob(suffix))
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    return _inventory(df, root, suffix)


def scan_files_stream(
    spark: SparkSession,
    root: str,
    suffix: str = ".shp",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming variant (S1 live mode): the chokidar watcher becomes a
    Structured Streaming file source; new files surface as new rows.
    Pair with ``Trigger.AvailableNow`` for the reference's
    debounce-then-snapshot behavior (T1) or ``ProcessingTime`` for
    continuous tailing.
    """
    reader = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", _ci_glob(suffix))
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return _inventory(reader.load(root), root, suffix)
