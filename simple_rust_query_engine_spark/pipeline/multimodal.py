"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the payload as a
``binary`` column (or a pointer into object storage) next to typed
metadata; run decode / feature-extraction as Arrow-batched pandas
functions over ``mapInPandas`` so bytes never round-trip through
row-at-a-time Python.

``decode_images`` carries BOTH kernels: a real ``PIL.Image.open``
path used when PIL imports on the executor (``codec="real"``/"auto"),
and a deterministic fake (``codec="fake"``) for environments without
a codec — the build container has none, so its tests and the
oracle-checked driver query run the fake while the real path is
covered by a skip-marked test.  The Spark-side plumbing — schema,
Arrow batch shape, partitioning, UDF signature — is identical for
both (the fake is pure arithmetic over the payload bytes, so the
Python path has an exact DuckDB twin).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decode output schema — what a real image decoder would produce
DECODE_SCHEMA = (
    "doc_id long, n_bytes int, format string, width int, height int, "
    "n_channels int, mean_luma double"
)

def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 text bytes
    standing in for an image payload) + typed metadata struct."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.octet_length(F.col("text")).alias("n_bytes"),
            F.md5(F.col("text")).alias("content_hash"),
            F.lit("fake/raw").alias("mime"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple:
    """Deterministic stand-in for an image decode (no PIL in the
    build container) — pure arithmetic over the payload bytes, so it
    has an exact DuckDB twin."""
    n = len(payload)
    width = n % 640 + 1
    height = (n * 7) % 480 + 1
    mean_luma = (sum(payload[:64]) % 2551) / 10.0 if n else 0.0
    return n, "fake", width, height, 3, mean_luma


def _real_decode(payload: bytes) -> tuple:
    """PIL decode: actual format/dimensions/bands plus the mean luma
    of a bounded grayscale thumbnail (64×64 cap keeps per-image cost
    flat regardless of source resolution).  Runs on the EXECUTOR,
    per Arrow batch — the import lives in the worker process."""
    import io

    import numpy as np
    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        fmt = (im.format or "unknown").lower()
        width, height = im.size
        n_channels = len(im.getbands())
        gray = im.convert("L")
        gray.thumbnail((64, 64))
        arr = np.asarray(gray, dtype=np.float64)
        mean_luma = float(arr.mean()) if arr.size else 0.0
    return len(payload), fmt, width, height, n_channels, mean_luma


def _codec_probe(codec: str):
    """Shared per-executor codec resolution for decode/resize: returns
    (use_real, decode_errors) — the decode-shaped (PAYLOAD-failure)
    error set that may fall back to the fake kernel in auto mode.
    UnidentifiedImageError/OSError = not a decodable image;
    ValueError/SyntaxError/EOFError/struct.error = truncated or
    corrupt payload paths inside PIL's format plugins;
    DecompressionBombError = a valid but hostile payload (it
    subclasses Exception directly, not OSError/ValueError).  ONLY
    these fall back — an environment failure (broken numpy,
    MemoryError, PIL misconfig) must PROPAGATE, not silently degrade
    every payload to fake metadata with no signal."""
    use_real = False
    if codec != "fake":
        try:
            import PIL  # noqa: F401 — probe the executor env

            use_real = True
        except ImportError:
            if codec == "real":
                raise
    if not use_real:
        return False, ()
    import struct

    from PIL import Image as _PILImage
    from PIL import UnidentifiedImageError

    return True, (
        UnidentifiedImageError,
        _PILImage.DecompressionBombError,
        OSError,
        ValueError,
        SyntaxError,
        EOFError,
        struct.error,
    )


def decode_images(payloads: DataFrame, codec: str = "auto") -> DataFrame:
    """Arrow-batched decode over mapInPandas. Each batch is a pandas
    DataFrame of (doc_id, payload); output rows follow DECODE_SCHEMA.

    ``codec`` selects the kernel, resolved PER EXECUTOR at batch time:

    * ``"fake"`` — the deterministic byte-arithmetic stub; the only
      bit-reproducible choice, and what the oracle-checked driver
      query pins (the driver corpus is text standing in for images —
      a real codec could not decode it anyway).
    * ``"real"`` — ``PIL.Image.open`` per payload; raises if PIL is
      missing on the executor or a payload is not a decodable image.
    * ``"auto"`` — real when PIL imports AND the payload decodes,
      per-payload fake fallback otherwise: the ingest-friendly mode
      for mixed/dirty corpora.

    Either way the Spark plan is identical: map-only, bytes move as
    Arrow batches, never row-at-a-time through the driver.

    Batch sizing at real image sizes (guide §4.2; measured r14,
    docs/AB_R14.jsonl): with multi-MB payloads set
    ``spark.sql.execution.arrow.maxBytesPerBatch`` to roughly 2× the
    typical payload (4 MB at 2 MB payloads measured 1.75× faster than
    the 64 MB default — small batches pipeline decode with transfer
    and bound worker memory; capping BELOW one payload regresses).
    Left at the session default here: driver-corpus payloads are
    ~1 KB, where the knob is a no-op, and a session-wide low cap
    would shrink every other Arrow kernel's batches."""
    if codec not in ("fake", "real", "auto"):
        raise ValueError(f"codec must be fake|real|auto, got {codec!r}")

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_real, _decode_errors = _codec_probe(codec)

        def one(payload: bytes) -> tuple:
            if use_real:
                try:
                    return _real_decode(payload)
                except _decode_errors:
                    if codec == "real":
                        raise
                    # auto: not a decodable image — deterministic fake
            return _fake_decode(payload)

        for pdf in batches:
            decoded = [one(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                decoded,
                columns=["n_bytes", "format", "width", "height", "n_channels", "mean_luma"],
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return payloads.select("doc_id", "payload").mapInPandas(
        decode_batch, schema=DECODE_SCHEMA
    )


def frame_sample(payloads: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' analog: deterministic byte-offset samples from
    each payload — the plan shape of video frame extraction (explode a
    per-row sample index, decode per sample)."""
    n = F.octet_length("payload")
    # guard n=0: sequence(0, -1) would COUNT DOWN ([0, -1]); an empty
    # payload must emit no frames
    offsets = F.when(
        n > 0,
        F.sequence(F.lit(0), F.floor((n - 1) / F.lit(every_n_bytes)).cast("int")),
    ).otherwise(F.array().cast("array<int>"))
    return payloads.select(
        "doc_id",
        F.explode(offsets).alias("frame_no"),
        n.alias("n_bytes"),
    ).withColumn("byte_offset", F.col("frame_no") * F.lit(every_n_bytes))


#: resize output schema — source geometry, aspect-fit target geometry,
#: a checksum of the resampled content, and WHICH kernel produced the
#: row: the two kernels emit different n_sampled/mean semantics (real:
#: out_w*out_h resized-grayscale pixels; fake: ≤16 payload-byte
#: samples), so auto-mode consumers need the per-row flag to interpret
#: them
RESIZE_SCHEMA = (
    "doc_id long, width int, height int, out_w int, out_h int, "
    "n_sampled int, mean_sampled double, used_real boolean"
)

#: aspect-fit bound for the resize target (the standard vision-model
#: input side)
RESIZE_MAX_SIDE = 224


def _fit_geometry(width: int, height: int, max_side: int) -> tuple:
    """Aspect-preserving fit into a max_side square, INTEGER-ONLY
    (floor division — identical in Python and DuckDB, no float scale
    that could round differently across engines); never upscales."""
    if width <= max_side and height <= max_side:
        return width, height
    if width >= height:
        return max_side, max(1, (height * max_side) // width)
    return max(1, (width * max_side) // height), max_side


def resize_images(
    payloads: DataFrame,
    max_side: int = RESIZE_MAX_SIDE,
    codec: str = "auto",
) -> DataFrame:
    """The RESIZE step of an image-ingest pipeline (decode →
    **resize** → feature-extract), Arrow-batched over ``mapInPandas``
    — same codec contract as ``decode_images``:

    * ``"fake"`` — deterministic stand-in (no codec in the build
      container): geometry comes from the fake decode, and the
      "resampled content" is a nearest-neighbor byte sample of the
      payload — out[i] = payload[(i*n)//T] for T = min(n, 16) sample
      positions, mean emitted as one double division.  Pure integer
      indexing → exact DuckDB twin.
    * ``"real"`` — ``PIL.Image.thumbnail`` (aspect-preserving, never
      upscales — the same POLICY as ``_fit_geometry``, but NOT the
      same rounding: thumbnail rounds the scaled side to nearest
      while ``_fit_geometry`` floors, so out_w/out_h can differ by
      1px between kernels — the contract pinned PIL-free by
      ``tests/test_pipeline_paths.py::
      test_fit_geometry_vs_pil_thumbnail_contract``), emitting the
      resized geometry and resized-grayscale mean; raises without PIL.
    * ``"auto"`` — real when the payload decodes, per-payload fake
      fallback (decode-shaped errors only, same policy as
      ``decode_images``).

    The two kernels emit DIFFERENT n_sampled/mean semantics (real:
    out_w·out_h resized pixels + pixel mean; fake: ≤16 byte samples +
    byte mean), so every row carries ``used_real`` naming its kernel
    — auto mode is a mix by design.

    Map-only at any scale: bytes move as Arrow batches, geometry and
    resampling are per-row arithmetic, no shuffle."""
    if codec not in ("fake", "real", "auto"):
        raise ValueError(f"codec must be fake|real|auto, got {codec!r}")

    def fake_one(doc_id, payload: bytes) -> tuple:
        n, _, width, height, _, _ = _fake_decode(payload)
        out_w, out_h = _fit_geometry(width, height, max_side)
        t = min(n, 16)
        if t:
            sampled = [payload[(i * n) // t] for i in range(t)]
            mean = sum(sampled) / t  # one double division
        else:
            mean = 0.0
        return (doc_id, width, height, out_w, out_h, t, mean, False)

    def real_one(doc_id, payload: bytes) -> tuple:
        import io

        import numpy as np
        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            width, height = im.size
            im2 = im.convert("L")
            im2.thumbnail((max_side, max_side))
            out_w, out_h = im2.size
            arr = np.asarray(im2, dtype=np.float64)
            mean = float(arr.mean()) if arr.size else 0.0
            return (doc_id, width, height, out_w, out_h, arr.size, mean, True)

    def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_real, decode_errors = _codec_probe(codec)

        def one(doc_id, payload: bytes) -> tuple:
            if use_real:
                try:
                    return real_one(doc_id, payload)
                except decode_errors:
                    if codec == "real":
                        raise
            return fake_one(doc_id, payload)

        cols = [
            "doc_id", "width", "height", "out_w", "out_h",
            "n_sampled", "mean_sampled", "used_real",
        ]
        for pdf in batches:
            yield pd.DataFrame(
                [one(d, p) for d, p in zip(pdf["doc_id"], pdf["payload"])],
                columns=cols,
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        resize_batch, schema=RESIZE_SCHEMA
    )


def q_multimodal_resize(t: dict) -> DataFrame:
    """Driver entry for the resize step, pinned to ``codec="fake"``
    (same reasoning as ``q_multimodal_decode`` — the corpus is text
    standing in for images, and only the arithmetic stub has an exact
    cross-engine twin)."""
    return resize_images(with_binary_payload(t["documents"]), codec="fake")


FEAT_SCHEMA = (
    "doc_id long, n_bytes int, min_byte int, max_byte int, "
    "mean_byte double, dominant_bin int"
)


def extract_features(payloads: DataFrame) -> DataFrame:
    """Feature extraction over the raw payload (the stand-in for an
    image/audio embedding step): byte-range stats + the dominant
    16-bin byte-histogram bin.  Arrow-batched mapInPandas, numpy per
    batch; deterministic integer arithmetic → exact DuckDB twin
    (mean is a single sum/n double division, same in both engines)."""

    def feat_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8)
                n = len(b)
                if n == 0:
                    rows.append((doc_id, 0, 0, 0, 0.0, 0))
                    continue
                hist = np.bincount(b >> 4, minlength=16)
                rows.append(
                    (
                        doc_id,
                        n,
                        int(b.min()),
                        int(b.max()),
                        int(b.sum()) / n,          # one double division
                        int(np.argmax(hist)),      # ties → lowest bin
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "min_byte", "max_byte",
                    "mean_byte", "dominant_bin",
                ],
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        feat_batch, schema=FEAT_SCHEMA
    )


def q_feature_extract(t: dict) -> DataFrame:
    return extract_features(with_binary_payload(t["documents"]))


def q_multimodal_meta(t: dict) -> DataFrame:
    """Metadata extraction over the binary payload — pure JVM
    expressions (oracle-checkable); the mapInPandas decode path is
    exercised by tests."""
    b = with_binary_payload(t["documents"])
    return b.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_hash").alias("content_hash"),
        (F.col("meta.n_bytes") % 640 + 1).alias("width"),
        (F.col("meta.n_bytes") * 7 % 480 + 1).alias("height"),
    )


def q_multimodal_decode(t: dict) -> DataFrame:
    """The full Arrow-batched mapInPandas decode path as a driver-
    contract query.  Pinned to ``codec="fake"``: the stub decode is
    deterministic arithmetic over the payload bytes, so the Python
    path gets an exact DuckDB twin (corpus is ASCII: byte ==
    codepoint) regardless of whether PIL exists on the executor.
    The real-codec path is covered by
    ``tests/test_pipeline_paths.py::test_decode_images_real_codec``
    (skipped where PIL is absent)."""
    return decode_images(with_binary_payload(t["documents"]), codec="fake")


def q_frame_sample(t: dict) -> DataFrame:
    """Frame-sampling plan shape: one row per (doc, byte-offset
    sample) via an exploded per-row sequence."""
    return frame_sample(with_binary_payload(t["documents"]))


ORACLE: dict[str, str] = {
    "multimodal_meta": """
        SELECT doc_id,
               octet_length(encode(text))::INT AS n_bytes,
               md5(text) AS content_hash,
               (octet_length(encode(text)) % 640 + 1)::INT AS width,
               (octet_length(encode(text)) * 7 % 480 + 1)::INT AS height
        FROM documents
    """,
    "multimodal_decode": """
        SELECT doc_id,
               octet_length(encode(text))::INT AS n_bytes,
               'fake' AS format,
               (octet_length(encode(text)) % 640 + 1)::INT AS width,
               (octet_length(encode(text)) * 7 % 480 + 1)::INT AS height,
               3 AS n_channels,
               ((COALESCE(list_sum(list_transform(
                    range(1, least(length(text), 64) + 1),
                    i -> ascii(text[i]))), 0) % 2551) / 10.0)::DOUBLE AS mean_luma
        FROM documents
    """,
    "feature_extract": """
        WITH codes AS (
            SELECT doc_id, octet_length(encode(text))::INT AS n_bytes,
                   list_transform(range(1, length(text) + 1),
                                  i -> ascii(text[i])) AS cs
            FROM documents
        ), hist AS (
            SELECT doc_id, n_bytes, cs,
                   [len(list_filter(cs, c -> c // 16 = b))
                    for b in range(0, 16)] AS h
            FROM codes
        )
        SELECT doc_id, n_bytes,
               COALESCE(list_min(cs), 0)::INT AS min_byte,
               COALESCE(list_max(cs), 0)::INT AS max_byte,
               CASE WHEN n_bytes = 0 THEN 0.0
                    ELSE list_sum(cs)::DOUBLE / n_bytes END AS mean_byte,
               (CASE WHEN n_bytes = 0 THEN 0
                     ELSE list_position(h, list_max(h)) - 1 END)::INT
                   AS dominant_bin
        FROM hist
    """,
    # fake-kernel twin: geometry from the fake decode, aspect-fit in
    # INTEGER floor division (identical semantics both engines), and
    # the nearest-neighbor byte resample at positions (i*n)//t — text
    # is ASCII so byte == codepoint, 1-based text[] vs 0-based payload
    "multimodal_resize": f"""
        WITH g AS (
            SELECT doc_id, text,
                   octet_length(encode(text)) AS n,
                   (octet_length(encode(text)) % 640 + 1) AS w,
                   (octet_length(encode(text)) * 7 % 480 + 1) AS h
            FROM documents
        ), fit AS (
            SELECT doc_id, text, n, w, h,
                   CASE WHEN w <= {RESIZE_MAX_SIDE} AND h <= {RESIZE_MAX_SIDE} THEN w
                        WHEN w >= h THEN {RESIZE_MAX_SIDE}
                        ELSE greatest(1, (w * {RESIZE_MAX_SIDE}) // h) END AS out_w,
                   CASE WHEN w <= {RESIZE_MAX_SIDE} AND h <= {RESIZE_MAX_SIDE} THEN h
                        WHEN w >= h THEN greatest(1, (h * {RESIZE_MAX_SIDE}) // w)
                        ELSE {RESIZE_MAX_SIDE} END AS out_h,
                   least(n, 16) AS t
            FROM g
        )
        SELECT doc_id, w::INT AS width, h::INT AS height,
               out_w::INT AS out_w, out_h::INT AS out_h,
               t::INT AS n_sampled,
               CASE WHEN t = 0 THEN 0.0
                    ELSE list_sum(list_transform(range(0, t),
                         i -> ascii(text[(i * n) // t + 1])))::DOUBLE / t
               END AS mean_sampled,
               FALSE AS used_real
        FROM fit
    """,
    "frame_sample": """
        WITH f AS (
            SELECT doc_id,
                   octet_length(encode(text))::INT AS n_bytes,
                   -- explicit 0-guard: DuckDB // truncates toward zero,
                   -- so (0-1)//64+1 = 1 would emit a phantom frame for
                   -- an empty payload (Spark side emits none)
                   unnest(range(0, CASE WHEN octet_length(encode(text)) = 0 THEN 0
                                        ELSE ((octet_length(encode(text)) - 1) // 64) + 1
                                   END)) AS fn
            FROM documents
        )
        SELECT doc_id, fn::INT AS frame_no, n_bytes,
               (fn * 64)::INT AS byte_offset
        FROM f
    """,
}

QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_resize": q_multimodal_resize,
    "feature_extract": q_feature_extract,
    "frame_sample": q_frame_sample,
}
