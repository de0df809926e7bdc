"""Scalar-function parity layer.

The reference declares 73 scalar functions in the ``ScalarFunction`` enum
(reference: ballista/core/proto/datafusion.proto:448-522). Nearly all map
1:1 onto ``pyspark.sql.functions`` (SURVEY.md §2.8); this module provides
the handful of shims where Spark has no direct builtin, plus ``FUNCTIONS``,
the explicit name→implementation parity table the tests certify.

Everything here stays JVM-side (Column expressions — no Python UDFs), so
all of it participates in whole-stage codegen and predicate pushdown.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_bin(stride_seconds: int, ts: Column, origin: str = "1970-01-01 00:00:00") -> Column:
    """DateBin (datafusion.proto:516) — bucket ``ts`` into ``stride``-sized
    bins anchored at ``origin``: origin + floor((ts-origin)/stride)*stride.
    Pure column arithmetic (codegen-friendly), no UDF."""
    o = F.to_timestamp(F.lit(origin))
    delta = F.unix_timestamp(ts) - F.unix_timestamp(o)
    bins = F.floor(delta / F.lit(stride_seconds))
    return F.timestamp_seconds(F.unix_timestamp(o) + bins * F.lit(stride_seconds))


def current_time() -> Column:
    """CurrentTime (datafusion.proto:519) — Spark has no TimeType
    (SURVEY.md §1.2); the reference's TIME maps to a HH:mm:ss string."""
    return F.date_format(F.current_timestamp(), "HH:mm:ss")


def digest(col: Column, algorithm: str) -> Column:
    """Digest(expr, algo) (datafusion.proto:455) — dispatch to Spark's
    hash family, mirroring DataFusion's supported algorithm set."""
    algo = algorithm.lower()
    if algo == "md5":
        return F.md5(col)
    if algo == "sha1":
        return F.sha1(col)
    if algo in ("sha224", "sha256", "sha384", "sha512"):
        return F.sha2(col, int(algo[3:]))
    raise ValueError(f"unsupported digest algorithm: {algorithm}")


def trunc_number(col: Column, scale: int = 0) -> Column:
    """Trunc (datafusion.proto:467) — truncate toward zero to ``scale``
    decimal places (Spark's ``trunc`` is date-only; numeric truncation is
    sign-aware floor/ceil)."""
    factor = 10**scale
    return F.when(col >= 0, F.floor(col * factor) / factor).otherwise(
        F.ceil(col * factor) / factor
    )


_SIMILAR_ESCAPE = re.compile(r"([.^$+?()\[\]{}|\\])")


def similar_to_regex(pattern: str) -> str:
    """Translate a SQL ``SIMILAR TO`` pattern to an anchored Java regex.

    SIMILAR TO (datafusion.proto:603-622 SimilarToNode) uses SQL LIKE
    wildcards ``%``/``_`` on top of a POSIX-regex-like syntax. Spark has no
    SIMILAR TO (SURVEY.md §2.7) → translate and use ``rlike``.
    Supported: % _ | * + ? () [] {} — the full SQL:1999 subset DataFusion
    accepts; ``.`` ``^`` ``$`` are literals in SIMILAR TO and get escaped.
    """
    out = []
    i = 0
    in_class = False
    while i < len(pattern):
        c = pattern[i]
        if in_class:
            out.append(c)
            if c == "]":
                in_class = False
        elif c == "[":
            out.append(c)
            in_class = True
        elif c == "%":
            out.append(".*")
        elif c == "_":
            out.append(".")
        elif c in ".^$":
            out.append("\\" + c)
        elif c == "\\" and i + 1 < len(pattern):
            out.append("\\" + pattern[i + 1])
            i += 1
        else:
            out.append(c)
        i += 1
    return "^" + "".join(out) + "$"


def similar_to(col: Column, pattern: str) -> Column:
    return col.rlike(similar_to_regex(pattern))


# Parity table: reference ScalarFunction enum name (datafusion.proto:448-522)
# → implementation. Lambdas close over pyspark builtins; shims above cover
# the gaps. Tests in tests/test_functions.py certify each row against the
# DuckDB oracle where DuckDB has an equivalent.
FUNCTIONS: dict[str, object] = {
    # math (SURVEY.md §2.8 Math row)
    "Abs": F.abs, "Acos": F.acos, "Asin": F.asin, "Atan": F.atan, "Atan2": F.atan2,
    "Ceil": F.ceil, "Cos": F.cos, "Exp": F.exp, "Floor": F.floor, "Ln": F.log,
    # DataFusion Log is log(x)=log10(x) AND log(base, x); Spark's 2-arg
    # F.log takes (base, col) in the same order as DataFusion's log(b, x)
    # (base must be a Python float — Spark restriction).
    "Log": lambda *a: F.log10(a[0]) if len(a) == 1 else F.log(a[0], a[1]),
    "Log10": F.log10, "Log2": F.log2, "Power": F.pow,
    "Round": F.round, "Signum": F.signum, "Sin": F.sin, "Sqrt": F.sqrt,
    "Tan": F.tan, "Trunc": trunc_number, "Random": F.rand,
    # string
    "Ascii": F.ascii, "BitLength": F.bit_length, "Btrim": F.btrim,
    "CharacterLength": F.char_length, "Chr": F.chr, "Concat": F.concat,
    "ConcatWithSeparator": F.concat_ws, "InitCap": F.initcap, "Left": F.left,
    "Lower": F.lower, "Lpad": F.lpad, "Ltrim": F.ltrim, "OctetLength": F.octet_length,
    "Repeat": F.repeat, "Replace": F.replace, "Reverse": F.reverse, "Right": F.right,
    "Rpad": F.rpad, "Rtrim": F.rtrim, "SplitPart": F.split_part,
    "StartsWith": F.startswith, "Strpos": F.instr, "Substr": F.substr,
    "ToHex": F.hex, "Translate": F.translate, "Trim": F.trim, "Upper": F.upper,
    # regex
    "RegexpMatch": lambda c, p: c.rlike(p), "RegexpReplace": F.regexp_replace,
    # hash / crypto
    "Digest": digest, "MD5": F.md5, "SHA224": lambda c: F.sha2(c, 224),
    "SHA256": lambda c: F.sha2(c, 256), "SHA384": lambda c: F.sha2(c, 384),
    "SHA512": lambda c: F.sha2(c, 512),
    # date / time
    "DatePart": F.date_part, "DateTrunc": F.date_trunc, "DateBin": date_bin,
    "ToTimestamp": F.to_timestamp, "ToTimestampMillis": F.timestamp_millis,
    "ToTimestampMicros": F.timestamp_micros, "ToTimestampSeconds": F.timestamp_seconds,
    "FromUnixtime": F.from_unixtime, "Now": F.now, "CurrentDate": F.current_date,
    "CurrentTime": current_time,
    # conditional / null
    "Coalesce": F.coalesce, "NullIf": F.nullif,
    # array / struct
    "Array": F.array, "StructFun": F.struct,
    # misc
    "ArrowTypeof": F.typeof, "Uuid": F.uuid,
    # expression-level (SURVEY.md §2.7): SIMILAR TO has no Spark form
    "SimilarTo": similar_to,
}
