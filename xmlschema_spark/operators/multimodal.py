"""Multimodal (image) rule kinds: decode / dims / PSNR / phash checks, plus
generic binary-column plumbing (resize, feature extract, frame sampling).

This is the scaled analog of the reference's "binary decodes cleanly"
validators (hex/base64, /root/reference/xmlschema/validators/builtins.py:139-155)
applied to opaque image payloads, per BASELINE.json's per-row invariant:
decoded-pixel consistency (PSNR ≥ 40 dB for lossy formats) + metadata
agreement.

Execution model: ``mapInPandas`` over Arrow batches — each batch is a
pandas DataFrame of (image_id, bytes, w, h, fmt, phash); the UDF body
decodes with the numpy codec and emits one verdict row per input row.
Batch size is capped via ``spark.sql.execution.arrow.maxRecordsPerBatch``
(session.py) because ``bytes`` is MB-scale at production; the scan reads
ONLY the needed columns (column pruning keeps this pass cheap relative to
the full row-rule pass).

Real image libraries (PIL/libjpeg/ffmpeg) are not in this container; the
codec in functions/codec.py provides real lossless/lossy semantics. The
``extract_frames`` video path is a declared stub (NotImplementedError)
with the Spark-side plumbing (schema, batching) in place.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmlschema_spark.functions import codec
from xmlschema_spark.rules import register_rule_kind

DECODE_CHECK_SCHEMA = (
    "image_id string, decode_ok boolean, fmt_match boolean, dims_match boolean, "
    "psnr double, psnr_ok boolean, phash_hamming int, phash_match boolean, error string"
)


def decode_check(
    df: DataFrame,
    psnr_db: float = 40.0,
    id_col: str = "image_id",
    check_phash: bool = True,
    phash_max_hamming_lossy: int = 20,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Per-row invariant table: does ``bytes`` decode, do decoded dims match
    declared (w, h), does fmt match the container, is PSNR vs a reference
    re-encode ≥ threshold for lossy formats, does phash recompute.

    For lossless formats PSNR is +inf (exact roundtrip); for lossy formats
    we decode and measure against the decoded pixels re-encoded losslessly
    — i.e. "the payload is internally consistent", the distributed analog
    of base64_binary_validator's strict decode (builtins.py:144-155).

    phash consistency is *perceptual*: the stored hash was computed on the
    original pixels, the check recomputes on the decoded pixels, so lossy
    formats may legitimately flip a few bits — exact match is required for
    lossless, hamming ≤ ``phash_max_hamming_lossy`` for lossy.

    ``passthrough`` columns (e.g. the partition column) are copied to the
    output unchanged — carrying them through the UDF is free, whereas
    joining them back afterwards costs a broadcast + join per run.
    """
    passthrough = [c for c in (passthrough or []) if c != id_col]
    cols = [id_col, "bytes", "w", "h", "fmt"] + (["phash"] if check_phash else [])
    cols += [c for c in passthrough if c not in cols]

    def batches(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        for rb in it:
            n = rb.num_rows
            names = rb.schema.names
            barr = rb.column(names.index("bytes"))
            # zero-copy per-row payload views: slice the Arrow data buffer
            # through the offsets buffer directly — materializing a Python
            # ``bytes`` per row would copy the full payload stream again
            # (pure DRAM traffic, the one resource more cores don't add)
            validity, off_buf = barr.buffers()[0], barr.buffers()[1]
            data_mv = memoryview(barr.buffers()[2]) if barr.buffers()[2] is not None else None
            # offsets buffer dtype follows the Arrow type: binary → int32,
            # large_binary (spark.sql.execution.arrow.useLargeVarTypes) →
            # int64 — assuming int32 would silently misread large_binary
            if pa.types.is_binary(barr.type):
                off_dtype = np.int32
            elif pa.types.is_large_binary(barr.type):
                off_dtype = np.int64
            else:
                raise TypeError(f"bytes column has Arrow type {barr.type}, expected (large_)binary")
            offs = np.frombuffer(off_buf, off_dtype, count=barr.offset + n + 1)
            if validity is None:
                valid = np.ones(n, bool)
            else:
                valid = np.unpackbits(
                    np.frombuffer(validity, np.uint8), bitorder="little"
                )[barr.offset: barr.offset + n].astype(bool)
            ws = rb.column(names.index("w")).to_numpy(zero_copy_only=False)
            hs = rb.column(names.index("h")).to_numpy(zero_copy_only=False)
            fmts = rb.column(names.index("fmt")).to_pylist()
            phs = (
                rb.column(names.index("phash")).to_numpy(zero_copy_only=False)
                if check_phash else None
            )

            decode_ok = np.zeros(n, bool)
            fmt_match = np.zeros(n, bool)
            dims_match = np.zeros(n, bool)
            psnr_v = np.zeros(n, np.float64)
            hamming_v = np.full(n, 64, np.int32)
            phash_ok = np.zeros(n, bool)
            errors: list[str | None] = [None] * n

            for i in range(n):
                try:
                    if not valid[i]:
                        raise ValueError("truncated header")
                    o0, o1 = offs[barr.offset + i], offs[barr.offset + i + 1]
                    pixels, actual_fmt = codec.decode_image(data_mv[o0:o1])
                    dh, dw = pixels.shape[:2]
                    fmt_match[i] = fmts[i] == actual_fmt
                    dims_match[i] = (ws[i] == dw) and (hs[i] == dh)
                    if actual_fmt in codec.LOSSLESS:
                        psnr_v[i] = float("inf")
                    else:
                        # internal-consistency PSNR: the decoded pixels
                        # must reproduce themselves through the lossy
                        # transform. reencode_values is the value-space
                        # encode→decode roundtrip minus the zlib stage
                        # (bijective — bytes change, values never do), so
                        # the PSNR is bit-identical to a real re-encode
                        # while skipping deflate+inflate per image.
                        re_dec = codec.reencode_values(pixels, actual_fmt)
                        psnr_v[i] = codec.psnr(pixels, re_dec)
                    if check_phash:
                        ham = codec.hamming64(codec.phash64(pixels), int(phs[i]))
                        limit = 0 if actual_fmt in codec.LOSSLESS else phash_max_hamming_lossy
                        hamming_v[i] = ham
                        phash_ok[i] = ham <= limit
                    else:
                        hamming_v[i] = 0
                        phash_ok[i] = True
                    decode_ok[i] = True
                except Exception as e:  # noqa: BLE001 — verdicts, not crashes
                    errors[i] = f"{type(e).__name__}: {e}"

            arrays = [
                rb.column(names.index(id_col)),  # zero-copy passthrough
                pa.array(decode_ok),
                pa.array(fmt_match),
                pa.array(dims_match),
                pa.array(psnr_v),
                pa.array((psnr_v >= psnr_db) & decode_ok),
                pa.array(hamming_v, pa.int32()),
                pa.array(phash_ok),
                pa.array(errors, pa.string()),
            ]
            out_names = [
                "image_id", "decode_ok", "fmt_match", "dims_match",
                "psnr", "psnr_ok", "phash_hamming", "phash_match", "error",
            ]
            for c in passthrough:
                arrays.append(rb.column(names.index(c)))  # zero-copy
                out_names.append(c)
            yield pa.RecordBatch.from_arrays(arrays, names=out_names)

    schema_src = df.select(*cols).schema
    schema = DECODE_CHECK_SCHEMA + "".join(
        f", {c} {schema_src[c].dataType.simpleString()}" for c in passthrough
    )
    return df.select(*cols).mapInArrow(batches, schema=schema)


HEADER_LEN = 12  # magic(4s) + w(u32 LE) + h(u32 LE), functions/codec.py
_HEX_MAGIC = {fmt: codec.MAGIC[fmt].hex().upper() for fmt in codec.FORMATS}


def _le32(bytes_col, off: int):
    """Little-endian u32 at 1-based byte offset ``off`` of a binary column,
    as a pure Catalyst expression: hex the 4 stored bytes, reverse the hex
    pairs, conv base-16. Stays inside whole-stage codegen — no Python."""
    h = F.hex(F.substring(bytes_col, off, 4))
    rev = F.concat(
        F.substring(h, 7, 2), F.substring(h, 5, 2),
        F.substring(h, 3, 2), F.substring(h, 1, 2),
    )
    return F.conv(rev, 16, 10).cast("long")


def header_fields(bytes_col) -> dict:
    """Container-header fields of an encoded image as Catalyst columns:
    ``header_fmt`` (format implied by the 4-byte magic, NULL if unknown),
    ``header_w`` / ``header_h`` (the u32 LE dims words). The magic is
    compared in hex (UTF-8-safe for arbitrary corrupt bytes).

    This is declared-metadata validation WITHOUT decoding: at 10^12 rows
    the full pixel decode is the expensive Arrow-UDF pass
    (:func:`decode_check`); the header, by contrast, is 12 bytes of pure
    JVM expression — `fmt`/`w`/`h` disagreement, truncation, and foreign
    containers are all caught in whole-stage codegen at scan speed. The
    scaled analog of the reference peeking at a resource's declared
    encoding before parsing (resources.py XMLResource lazy checks)."""
    magic_hex = F.hex(F.substring(bytes_col, 1, 4))
    hdr_fmt = F.lit(None).cast("string")
    for fmt, mh in _HEX_MAGIC.items():
        hdr_fmt = F.when(magic_hex == F.lit(mh), F.lit(fmt)).otherwise(hdr_fmt)
    return {
        "header_fmt": hdr_fmt,
        "header_w": _le32(bytes_col, 5),
        "header_h": _le32(bytes_col, 9),
    }


def header_check(
    df: DataFrame,
    id_col: str = "image_id",
    part_col: str | None = None,
) -> DataFrame:
    """Violation rows for declared-metadata vs container-header disagreement
    — the zero-decode row-rule family:

    - ``header_short``     — bytes non-null but shorter than the 12-byte header
    - ``header_magic``     — unknown 4-byte magic (foreign/garbage container)
    - ``header_fmt_match`` — declared ``fmt`` != format implied by the magic
    - ``header_w_match`` / ``header_h_match`` — declared dims != header dims
      (catches the ``bad_dims`` corruption family without touching pixels)

    One pruned scan, one Generate (explode of a per-row violation array)
    — no shuffle, no Python. The magic/dims decodes appear once per rule
    branch in the plan (CollapseProject inlines any pre-projection and
    CASE branches defeat codegen subexpression elimination — the
    compiler's ``_np`` note), but each is a ≤ 4-byte hex/conv: nanoseconds
    against the KB-scale ``bytes`` column the scan already moves, so the
    pass stays scan-bound at any row count. Null ``bytes`` is the
    ``bytes_not_null`` rule's job; null declared ``fmt``/``w``/``h`` skip
    their comparison (not_null rules own missingness). Output matches the
    engine's violation shape (partition_id, rule_id, row_id, column,
    severity)."""
    b = F.col("bytes")
    hf = header_fields(b)
    long_enough = b.isNotNull() & (F.octet_length(b) >= HEADER_LEN)
    known = long_enough & hf["header_fmt"].isNotNull()

    def _v(cond, rule: str, column: str):
        return F.when(
            cond,
            F.struct(F.lit(rule).alias("rule_id"), F.lit(column).alias("column")),
        )

    viols = F.array(
        _v(b.isNotNull() & (F.octet_length(b) < HEADER_LEN), "header_short", "bytes"),
        _v(long_enough & hf["header_fmt"].isNull(), "header_magic", "bytes"),
        _v(
            known & F.col("fmt").isNotNull() & (F.col("fmt") != hf["header_fmt"]),
            "header_fmt_match", "fmt",
        ),
        _v(
            known & F.col("w").isNotNull() & (F.col("w").cast("long") != hf["header_w"]),
            "header_w_match", "w",
        ),
        _v(
            known & F.col("h").isNotNull() & (F.col("h").cast("long") != hf["header_h"]),
            "header_h_match", "h",
        ),
    )
    part = F.col(part_col) if part_col else F.lit("__table__")
    return (
        df.select(
            part.alias("partition_id"),
            F.col(id_col).alias("row_id"),
            F.explode(F.filter(viols, lambda x: x.isNotNull())).alias("__v"),
        )
        .select(
            "partition_id",
            F.col("__v.rule_id").alias("rule_id"),
            "row_id",
            F.col("__v.column").alias("column"),
            F.lit("error").alias("severity"),
        )
    )


def _header_rule_ok(rule):
    """Compile fn for the registered ``header_consistent`` rule kind:
    True ⇔ the row passes. ``rule.column`` is the binary column (default
    ``bytes``); ``params.check`` picks one aspect — ``short`` / ``magic``
    / ``fmt`` / ``w`` / ``h`` — or ``all`` (default, the conjunction).
    ``params.fmt_col/w_col/h_col`` rename the declared-metadata columns.

    Facet NULL semantics throughout: NULL bytes passes every check
    (``not_null`` owns missingness), a too-short payload passes the
    field checks (``short`` owns truncation), an unknown magic passes
    the fmt/dims checks (``magic`` owns foreign containers), and NULL
    declared metadata passes its comparison."""
    b = F.col(rule.column or "bytes")
    hf = header_fields(b)
    fmt_col = F.col((rule.params or {}).get("fmt_col", "fmt"))
    w_col = F.col((rule.params or {}).get("w_col", "w"))
    h_col = F.col((rule.params or {}).get("h_col", "h"))
    too_short = F.octet_length(b) < HEADER_LEN
    skip_fields = b.isNull() | too_short | hf["header_fmt"].isNull()
    oks = {
        "short": b.isNull() | ~too_short,
        "magic": b.isNull() | too_short | hf["header_fmt"].isNotNull(),
        "fmt": skip_fields | fmt_col.isNull() | (fmt_col == hf["header_fmt"]),
        "w": skip_fields | w_col.isNull() | (w_col.cast("long") == hf["header_w"]),
        "h": skip_fields | h_col.isNull() | (h_col.cast("long") == hf["header_h"]),
    }
    check = (rule.params or {}).get("check", "all")
    if check == "all":
        ok = oks["short"]
        for k in ("magic", "fmt", "w", "h"):
            ok = ok & oks[k]
        return ok
    if check not in oks:
        from xmlschema_spark.rules import RuleCompileError

        raise RuleCompileError(
            f"{rule.rule_id}: header_consistent check must be one of "
            f"{sorted(oks)} or 'all', got {check!r}"
        )
    return oks[check]


def _header_rule_reason(rule) -> str:
    check = (rule.params or {}).get("check", "all")
    return f"container header inconsistent with declared metadata (check={check})"


# Declarative integration: rulesets may say {"kind": "header_consistent"}
# and the zero-decode header validation flows through the engine's normal
# violation/verdict/checkpoint path (the same extension registry user
# facets use, rules.register_rule_kind).
register_rule_kind("header_consistent", _header_rule_ok, _header_rule_reason)


def regex_check(df: DataFrame, column: str, pattern: str, id_col: str) -> DataFrame:
    """Fallback for XSD patterns the Java-regex translator can't express:
    anchored Python ``re`` applied per Arrow batch via a vectorized pandas
    UDF (pandas str.match is C-loop over the batch, not per-row Python)."""
    compiled_src = pattern

    @F.pandas_udf("boolean")
    def _matches(s: pd.Series) -> pd.Series:
        rex = re.compile(compiled_src)
        return s.str.fullmatch(rex).astype("boolean")

    return df.select(
        F.col(id_col).alias("row_id"),
        F.col(column),
        _matches(F.col(column)).alias("matches"),
    )


def resize_images(df: DataFrame, out_w: int, out_h: int, id_col: str = "image_id") -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode lossless. Demonstrates
    the transform path (feature-extraction plumbing) on binary columns."""
    schema = f"{id_col} string, bytes binary, w int, h int, fmt string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for row in pdf.itertuples(index=False):
                try:
                    pixels, _ = codec.decode_image(row.bytes)
                except ValueError:
                    continue
                h, w = pixels.shape[:2]
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                resized = pixels[yi][:, xi]
                ids.append(getattr(row, id_col))
                blobs.append(codec.encode_image(resized, "png"))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "bytes": blobs,
                    "w": out_w,
                    "h": out_h,
                    "fmt": "png",
                }
            )

    return df.select(id_col, "bytes").mapInPandas(batches, schema=schema)


def extract_features(df: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Per-image feature extraction over Arrow batches: mean RGB, luma
    mean/std, an 8-bin luma histogram (array<double>, L1-normalized), and
    aspect ratio. The feature-extract stage of a training-data pipeline —
    same pruned-scan + mapInPandas shape as decode_check, numpy-vectorized
    per image, no per-row Python in the driver path."""
    schema = (
        f"{id_col} string, mean_r double, mean_g double, mean_b double, "
        "luma_mean double, luma_std double, luma_hist array<double>, "
        "aspect double, decode_ok boolean"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                rid = getattr(row, id_col)
                try:
                    pixels, _ = codec.decode_image(row.bytes)
                except ValueError:
                    rows.append((rid, 0.0, 0.0, 0.0, 0.0, 0.0, [0.0] * 8, 0.0, False))
                    continue
                p = pixels.astype(np.float64)
                luma = p[..., 0] * 0.299 + p[..., 1] * 0.587 + p[..., 2] * 0.114
                hist, _ = np.histogram(luma, bins=8, range=(0, 256))
                hist = (hist / max(hist.sum(), 1)).tolist()
                h, w = pixels.shape[:2]
                rows.append(
                    (
                        rid,
                        float(p[..., 0].mean()), float(p[..., 1].mean()), float(p[..., 2].mean()),
                        float(luma.mean()), float(luma.std()),
                        hist, float(w) / float(h), True,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "mean_r", "mean_g", "mean_b",
                    "luma_mean", "luma_std", "luma_hist", "aspect", "decode_ok",
                ],
            )

    return df.select(id_col, "bytes").mapInPandas(batches, schema=schema)


def extract_frames(
    df: DataFrame,
    every_n: int = 30,
    decode_fn=None,
    id_col: str = "video_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Video frame sampling over a PLUGGABLE codec hook.

    ``decode_fn(data: bytes) -> Iterable[bytes]`` yields the video's
    encoded frames in order (e.g. a PyAV/ffmpeg wrapper on a real
    cluster); it is pickled into the executor closure, so it must be a
    module-level callable. Every ``every_n``-th frame (0, n, 2n, …) is
    emitted as one output row ``(id_col, frame_idx, bytes)``. A video
    that fails to decode (``decode_fn`` raises ``ValueError``)
    contributes zero rows — downstream coverage checks (count of
    distinct ids in vs out) surface the drops, matching the
    decode-verdict pattern of the image suite.

    With ``decode_fn=None`` (this sandbox has no video codec) the
    operator is a declared stub: the plan builds — schema, Arrow batch
    shape, and partitioning are real — but the UDF body raises
    ``NotImplementedError`` on its first non-empty batch.

    Scale shape: ``mapInPandas`` over only (id, bytes) — column-pruned
    scan, one Arrow crossing per video, one output DataFrame per input
    row so a long video never accumulates all its frames in memory
    alongside its neighbours'.
    """
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    schema = f"{id_col} string, frame_idx int, bytes binary"
    cols = [id_col, "frame_idx", "bytes"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode_fn is None:
                raise NotImplementedError(
                    "video decode requires a codec: pass decode_fn="
                    "(bytes -> iterable of frame bytes), e.g. a PyAV wrapper"
                )
            for row in pdf.itertuples(index=False):
                rid = getattr(row, id_col)
                try:
                    frames = decode_fn(getattr(row, bytes_col))
                except ValueError:
                    continue
                out = [
                    (rid, i, f) for i, f in enumerate(frames) if i % every_n == 0
                ]
                if out:
                    yield pd.DataFrame(out, columns=cols)

    return df.select(id_col, bytes_col).mapInPandas(batches, schema=schema)


def audio_features(
    df: DataFrame,
    decode_fn=None,
    id_col: str = "audio_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Per-clip audio feature extraction over a pluggable codec hook —
    the audio twin of :func:`image_features`.

    ``decode_fn(data: bytes) -> (samples, sample_rate)`` returns a 1-D
    float numpy array of mono PCM samples plus the rate (e.g. a
    soundfile/ffmpeg wrapper). Output: one row per clip with
    ``duration_s``, ``rms`` (loudness), ``peak``, ``zero_cross_rate``
    (crude voicing/noisiness proxy) and ``decode_ok``; undecodable
    clips (``ValueError``) keep their row with ``decode_ok=false`` and
    zeroed features, so the operator is row-preserving and feeds the
    same verdict machinery as the image suite.

    With ``decode_fn=None`` the UDF body raises ``NotImplementedError``
    on the first non-empty batch (no audio codec in this sandbox); the
    Spark-side plumbing is real and unit-tested with a fake codec.
    """
    schema = (
        f"{id_col} string, duration_s double, rms double, peak double, "
        "zero_cross_rate double, decode_ok boolean"
    )
    cols = [id_col, "duration_s", "rms", "peak", "zero_cross_rate", "decode_ok"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode_fn is None:
                raise NotImplementedError(
                    "audio decode requires a codec: pass decode_fn="
                    "(bytes -> (mono float ndarray, sample_rate))"
                )
            rows = []
            for row in pdf.itertuples(index=False):
                rid = getattr(row, id_col)
                try:
                    samples, rate = decode_fn(getattr(row, bytes_col))
                except ValueError:
                    rows.append((rid, 0.0, 0.0, 0.0, 0.0, False))
                    continue
                s = np.asarray(samples, dtype=np.float64)
                n = s.size
                zcr = float(np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1]))) / max(n - 1, 1)
                rows.append(
                    (
                        rid,
                        float(n) / float(rate),
                        float(np.sqrt(np.mean(s * s))) if n else 0.0,
                        float(np.abs(s).max()) if n else 0.0,
                        zcr,
                        True,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, bytes_col).mapInPandas(batches, schema=schema)
