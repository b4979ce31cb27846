"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Images/audio/video are carried as Arrow ``binary`` columns plus a metadata
struct (format, width, height). Decode / feature-extract / resize /
frame-sample run as actor-pool ``map_batches`` stages with SMALL batch sizes
(a batch of large binaries times pool concurrency must fit worker heap — the
memory note from the project brief). The actual codecs (PIL/ffmpeg) are not
present in this container, so the decode step is STUBBED: the Ray-side
plumbing — schema, actor signature, batch sizing, output layout — is real and
tested, while ``format`` values other than ``fake`` raise
``NotImplementedError``.

The ``fake`` decoder is deterministic AND oracle-reproducible: its features
derive from the md5 digest of the payload exactly as DuckDB's
``md5_number_lower``/``md5_number_upper`` expose it (bytes 8..16 / 0..8 of
the digest, little-endian — the same correspondence functions/minhash.py
verifies for token hashing), so the whole multimodal path — payload attach,
actor-pool feature extraction, frame sampling — is value-checkable against a
DuckDB oracle, not just row-counted.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

from tcx2graph_jl_ray.functions.hygiene import nonnull_text

FAKE_FORMAT = "fake"
_FEATURE_DIM = 8


def _md5_halves(payload: bytes) -> tuple[int, int]:
    """(lower, upper) 64-bit halves of md5, matching DuckDB's
    md5_number_lower / md5_number_upper (digest bytes 8..16 / 0..8, LE)."""
    d = hashlib.md5(payload).digest()
    return (
        int.from_bytes(d[8:16], "little"),
        int.from_bytes(d[0:8], "little"),
    )


def attach_fake_payload(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Test/bench helper: synthesize a binary payload column (+ metadata) from
    the text column, standing in for real image bytes."""

    def make(batch: pd.DataFrame) -> pd.DataFrame:
        batch = nonnull_text(batch)
        payload = [t.encode() for t in batch["text"].to_numpy()]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64").to_numpy(),
                "payload": payload,
                "format": FAKE_FORMAT,
                "width": pd.array([len(p) % 640 for p in payload], dtype="int32"),
                "height": pd.array([len(p) % 480 for p in payload], dtype="int32"),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        make, batch_format="pandas", batch_size=2048
    )


class PayloadFeatureExtractor:
    """Actor-pool stage: binary payload -> fixed-dim feature vector.

    __init__ is where a real model/codec would load ONCE per actor; here it
    resolves the decoder table. Unknown formats fail loudly — a stub must
    never silently fabricate output for real media.
    """

    def __init__(self):
        self.decoders = {FAKE_FORMAT: self._decode_fake}
        # soft-import: when the environment ships a real image codec, decode
        # real formats; absent it, unknown formats keep failing loudly below
        try:
            from PIL import Image  # noqa: F401

            self.decoders["png"] = self._decode_pil
            self.decoders["jpeg"] = self._decode_pil
        except ImportError:
            pass

    @staticmethod
    def _decode_pil(payload: bytes) -> np.ndarray:
        """Real-image feature head (only registered when PIL imports):
        per-channel mean/std over RGB + normalized geometry — the same
        8-float output contract as the fake codec, deterministic for a given
        payload."""
        import io

        from PIL import Image

        im = Image.open(io.BytesIO(payload)).convert("RGB")
        arr = np.asarray(im, dtype=np.float64) / 255.0
        means = arr.mean(axis=(0, 1))
        stds = arr.std(axis=(0, 1))
        return np.array(
            [*means, *stds, im.width / 65536.0, im.height / 65536.0],
            dtype=np.float64,
        )

    @staticmethod
    def _decode_fake(payload: bytes) -> np.ndarray:
        # 8 deterministic floats in [0, 1): four 16-bit lanes from each md5
        # half, in DuckDB md5_number_lower/_upper bit order (oracle-exact)
        lo, hi = _md5_halves(payload)
        lanes = [(lo >> (16 * j)) & 0xFFFF for j in range(4)] + [
            (hi >> (16 * j)) & 0xFFFF for j in range(4)
        ]
        return np.array(lanes, dtype=np.float64) / 65536.0

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = []
        for fmt, payload in zip(batch["format"].to_numpy(), batch["payload"].to_numpy()):
            decoder = self.decoders.get(fmt)
            if decoder is None:
                raise NotImplementedError(
                    f"no codec for format={fmt!r} in this environment; "
                    "register a decoder (PIL/ffmpeg) in PayloadFeatureExtractor"
                )
            feats.append(decoder(bytes(payload)))
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64").to_numpy(),
                "feature": [f.astype(np.float32) for f in feats],
            }
        )


def extract_payload_features(
    payloads: ray.data.Dataset, concurrency=(1, 4), batch_size: int = 256
) -> ray.data.Dataset:
    """Feature extraction over binary payloads. Batch size is deliberately
    small: batch_bytes x concurrency must fit in the worker heap for real
    media (the large-binary memory rule)."""
    return payloads.map_batches(
        PayloadFeatureExtractor,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class _FeatureWiden(PayloadFeatureExtractor):
    """Feature extraction that keeps payload metadata and emits scalar
    feature columns — one actor-pool stage, no join (the metadata rides the
    same row through the decode)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = super().__call__(batch)
        v = np.stack(feats["feature"].to_numpy()).astype(np.float64)
        out = {
            "doc_id": batch["doc_id"].astype("int64").to_numpy(),
            "n_bytes": batch["payload"].map(len).astype("int64").to_numpy(),
            "width": batch["width"].astype("int32").to_numpy(),
            "height": batch["height"].astype("int32").to_numpy(),
        }
        for j in range(_FEATURE_DIM):
            out[f"f{j}"] = v[:, j]
        return pd.DataFrame(out)


def payload_feature_table(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Oracle-checkable multimodal pipeline: attach payloads, decode+extract
    through one actor pool, emit SCALAR columns (list columns don't hash
    stably across engines). Output: doc_id, n_bytes, width, height, f0..f7."""
    return attach_fake_payload(docs).map_batches(
        _FeatureWiden,
        batch_format="pandas",
        batch_size=256,
        concurrency=(1, 4),
    )


MULTIMODAL_FEATURES_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
       CAST(octet_length(encode(text)) % 480 AS INTEGER) AS height,
       CAST((md5_number_lower(text) >> 0)  & 65535 AS DOUBLE) / 65536.0 AS f0,
       CAST((md5_number_lower(text) >> 16) & 65535 AS DOUBLE) / 65536.0 AS f1,
       CAST((md5_number_lower(text) >> 32) & 65535 AS DOUBLE) / 65536.0 AS f2,
       CAST((md5_number_lower(text) >> 48) & 65535 AS DOUBLE) / 65536.0 AS f3,
       CAST((md5_number_upper(text) >> 0)  & 65535 AS DOUBLE) / 65536.0 AS f4,
       CAST((md5_number_upper(text) >> 16) & 65535 AS DOUBLE) / 65536.0 AS f5,
       CAST((md5_number_upper(text) >> 32) & 65535 AS DOUBLE) / 65536.0 AS f6,
       CAST((md5_number_upper(text) >> 48) & 65535 AS DOUBLE) / 65536.0 AS f7
FROM documents WHERE text IS NOT NULL
"""


class PayloadResizer:
    """Actor-pool stage: resize payloads to (width, height). Real media would
    decode-resize-reencode per format; the fake codec's deterministic stand-in
    cycles the payload bytes to the byte budget implied by the new geometry.
    Unknown formats fail loudly."""

    def __init__(self, width: int, height: int, bytes_per_px: int = 1):
        self.width = width
        self.height = height
        self.bytes_per_px = bytes_per_px
        self.target = max(1, width * height * bytes_per_px)
        self.resizers = {FAKE_FORMAT: self._resize_fake}
        # soft-import: real image resize when PIL is present
        try:
            from PIL import Image  # noqa: F401

            self.resizers["png"] = self._resize_pil
            self.resizers["jpeg"] = self._resize_pil
        except ImportError:
            pass

    def _resize_pil(self, payload: bytes) -> bytes:
        """Real decode-resize (only registered when PIL imports): raw
        grayscale (bytes_per_px=1) or RGB bytes at the target geometry —
        same output byte budget as the fake path."""
        import io

        from PIL import Image

        mode = "L" if self.bytes_per_px == 1 else "RGB"
        im = Image.open(io.BytesIO(payload)).convert(mode)
        return im.resize((self.width, self.height)).tobytes()

    def _resize_fake(self, payload: bytes) -> bytes:
        if not payload:
            return b"\x00" * self.target
        reps = -(-self.target // len(payload))  # ceil
        return (payload * reps)[: self.target]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for fmt, payload in zip(batch["format"].to_numpy(), batch["payload"].to_numpy()):
            fn = self.resizers.get(fmt)
            if fn is None:
                raise NotImplementedError(f"no resizer for format={fmt!r}")
            out.append(fn(bytes(payload)))
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64").to_numpy(),
                "payload": out,
                "format": batch["format"].to_numpy(),
                "width": pd.array([self.width] * len(batch), dtype="int32"),
                "height": pd.array([self.height] * len(batch), dtype="int32"),
            }
        )


def resize_payloads(
    payloads: ray.data.Dataset,
    width: int,
    height: int,
    concurrency=(1, 4),
    batch_size: int = 128,
) -> ray.data.Dataset:
    """Resize stage. Output payload size is width*height bytes per row, so the
    batch budget shrinks with the target geometry (batch_size x target_bytes x
    concurrency must fit worker heap)."""
    return payloads.map_batches(
        PayloadResizer,
        fn_constructor_args=(width, height),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Actor-pool stage: sample every ``every_n``-th fixed-size frame from a
    "video" payload (one output row per sampled frame — a flat-map shape).
    The fake codec treats the payload as a flat sequence of ``frame_bytes``
    chunks (final partial chunk included); real video would seek keyframes."""

    def __init__(self, frame_bytes: int = 64, every_n: int = 2):
        self.frame_bytes = frame_bytes
        self.every_n = every_n
        self.samplers = {FAKE_FORMAT: self._frames_fake}

    def _frames_fake(self, payload: bytes) -> list[tuple[int, bytes]]:
        fb = self.frame_bytes
        n_frames = -(-len(payload) // fb) if payload else 0
        return [
            (i, payload[i * fb : (i + 1) * fb])
            for i in range(0, n_frames, self.every_n)
        ]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, sigs, lens = [], [], [], []
        for did, fmt, payload in zip(
            batch["doc_id"].astype("int64").to_numpy(),
            batch["format"].to_numpy(),
            batch["payload"].to_numpy(),
        ):
            fn = self.samplers.get(fmt)
            if fn is None:
                raise NotImplementedError(f"no frame sampler for format={fmt!r}")
            for idx, frame in fn(bytes(payload)):
                ids.append(did)
                idxs.append(idx)
                lens.append(len(frame))
                # md5_number_lower of the frame, reinterpreted int64 (oracle-
                # matchable signature without shipping frame bytes downstream)
                sigs.append(np.uint64(_md5_halves(frame)[0]).astype(np.int64))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_bytes": pd.Series(lens, dtype="int64"),
                "frame_sig": pd.Series(sigs, dtype="int64"),
            }
        )


def sample_frames(
    payloads: ray.data.Dataset,
    frame_bytes: int = 64,
    every_n: int = 2,
    concurrency=(1, 4),
    batch_size: int = 256,
) -> ray.data.Dataset:
    """Frame sampling over video-like payloads: one row per sampled frame
    (doc_id, frame_idx, frame_bytes, frame_sig)."""
    return payloads.map_batches(
        FrameSampler,
        fn_constructor_args=(frame_bytes, every_n),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# Frames of the fake payload are substrings of text, and the oracle's substr
# slices CHARACTERS while the engine slices payload BYTES — identical only
# for ASCII text (true of the fake corpus; asserted nowhere else). A
# non-ASCII corpus would need a hex-sliced oracle (DuckDB has no BLOB
# substring) — the engine's byte semantics are the authoritative contract
# for real media. Frame i covers bytes [i*fb, (i+1)*fb); signature =
# md5_number_lower reinterpreted to BIGINT (two's complement).
FRAME_SAMPLE_SQL_TEMPLATE = """
WITH d AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n,
         CAST(ceil(octet_length(encode(text)) / {frame_bytes}.0) AS BIGINT)
           AS n_frames
  FROM documents WHERE text IS NOT NULL
),
f AS (
  SELECT doc_id, text, n, t.i AS frame_idx
  FROM d, unnest(range(0, n_frames)) AS t(i)
  WHERE t.i % {every_n} = 0
),
s AS (
  SELECT doc_id, frame_idx,
         substr(text, frame_idx * {frame_bytes} + 1, {frame_bytes}) AS frame
  FROM f
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(octet_length(encode(frame)) AS BIGINT) AS frame_bytes,
       CAST(CASE WHEN md5_number_lower(frame) >= 9223372036854775808
                 THEN CAST(md5_number_lower(frame) AS HUGEINT)
                      - 18446744073709551616
                 ELSE CAST(md5_number_lower(frame) AS HUGEINT)
            END AS BIGINT) AS frame_sig
FROM s
"""


class AudioFramer:
    """Actor-pool stage: audio-like payload -> overlapping strided windows
    with per-window energy features — the standard audio front-end shape
    (decode once -> frame with hop -> vectorized per-frame feature). A real
    codec (PCM decode, resample) would load in ``__init__``; the fake
    decoder interprets the payload bytes as uint8 samples. Unknown formats
    fail loudly, like every multimodal stage here.

    Per window of ``width`` bytes every ``hop`` bytes (only FULL windows —
    trailing partials are dropped, the usual framing convention):
    ``energy`` = Σ sample², ``peak`` = max sample. Integer-exact, so the
    ASCII fake corpus has a value-exact DuckDB oracle (real media keeps the
    engine's byte semantics as the authoritative contract).
    """

    def __init__(self, width: int = 32, hop: int = 16):
        self.width = width
        self.hop = hop
        self.decoders = {FAKE_FORMAT: self._decode_fake}
        # soft-import: real PCM decode when the environment has soundfile
        try:
            import soundfile  # noqa: F401

            self.decoders["wav"] = self._decode_wav
            self.decoders["flac"] = self._decode_wav
        except ImportError:
            pass

    @staticmethod
    def _decode_fake(payload: bytes) -> np.ndarray:
        return np.frombuffer(payload, dtype=np.uint8)

    @staticmethod
    def _decode_wav(payload: bytes) -> np.ndarray:
        """Real audio decode (only registered when soundfile imports):
        PCM samples scaled to int16 range, mono-mixed — windows/energy/peak
        then follow the same integer framing as the fake path."""
        import io

        import soundfile as sf

        data, _sr = sf.read(io.BytesIO(payload), dtype="float64")
        if data.ndim > 1:
            data = data.mean(axis=1)
        return np.clip(data * 32767.0, -32768, 32767).astype(np.int64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, energies, peaks = [], [], [], []
        for did, fmt, payload in zip(
            batch["doc_id"].astype("int64").to_numpy(),
            batch["format"].to_numpy(),
            batch["payload"].to_numpy(),
        ):
            fn = self.decoders.get(fmt)
            if fn is None:
                raise NotImplementedError(f"no audio decoder for format={fmt!r}")
            x = fn(bytes(payload)).astype(np.int64)
            n = len(x)
            if n < self.width:
                continue
            n_win = (n - self.width) // self.hop + 1
            starts = np.arange(n_win) * self.hop
            # strided window view: (n_win, width) without copying
            win = np.lib.stride_tricks.sliding_window_view(x, self.width)[
                starts
            ]
            ids.extend([did] * n_win)
            idxs.extend(range(n_win))
            energies.extend((win * win).sum(axis=1).tolist())
            peaks.extend(win.max(axis=1).tolist())
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "window_idx": pd.Series(idxs, dtype="int64"),
                "energy": pd.Series(energies, dtype="int64"),
                "peak": pd.Series(peaks, dtype="int64"),
            }
        )


def audio_windows(
    payloads: ray.data.Dataset,
    width: int = 32,
    hop: int = 16,
    concurrency=(1, 4),
    batch_size: int = 256,
) -> ray.data.Dataset:
    """Strided audio framing + energy features over binary payloads.
    Output: doc_id, window_idx, energy:int64, peak:int64."""
    return payloads.map_batches(
        AudioFramer,
        fn_constructor_args=(width, hop),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# The fake payload is ASCII text, so sample value = ascii(char); energy and
# peak reduce over the window's characters (the engine's byte semantics are
# authoritative for real media — see FRAME_SAMPLE_SQL_TEMPLATE's note).
AUDIO_WINDOWS_SQL_TEMPLATE = """
WITH d AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
  WHERE text IS NOT NULL AND octet_length(encode(text)) >= {width}
),
w AS (
  SELECT doc_id, text, t.i AS window_idx
  FROM d, unnest(range(0, (n - {width}) // {hop} + 1)) AS t(i)
),
s AS (
  SELECT doc_id, window_idx,
         ascii(substr(text, window_idx * {hop} + u.j + 1, 1)) AS v
  FROM w, unnest(range(0, {width})) AS u(j)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(window_idx AS BIGINT) AS window_idx,
       CAST(SUM(v * v) AS BIGINT) AS energy,
       CAST(MAX(v) AS BIGINT) AS peak
FROM s
GROUP BY doc_id, window_idx
"""


MODALITIES = ("image", "audio", "video")


def shard_manifest(
    docs: ray.data.Dataset, n_shards: int = 8
) -> ray.data.Dataset:
    """Shard manifest for a multimodal payload corpus: per (modality,
    shard) item counts, byte totals and the doc-id range — the planning
    table a resumable bulk writer consumes (one output directory per
    manifest row; a restarted run skips rows whose directory is complete,
    the ``state/manifest.py`` discipline applied to binary payloads).

    Shard assignment is a deterministic hash of the key (doc_id %
    n_shards), never an enumeration order — resumability requires that a
    re-run assign every payload to the same shard regardless of block
    arrival order. Modality is the synthetic doc_id % 3 tag (stands in for
    a real media-type column; the payload bytes are the fake codec's).
    Per-batch partials are bounded by |modalities| x n_shards rows, then
    one bucketed merge. Output: modality, shard, n_items, total_bytes,
    min_doc_id, max_doc_id."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    payloads = attach_fake_payload(docs)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        doc = batch["doc_id"].astype("int64")
        d = pd.DataFrame({
            "modality": doc.mod(3).map(dict(enumerate(MODALITIES))),
            "shard": doc.mod(n_shards).astype("int64"),
            "doc_id": doc,
            "nb": batch["payload"].map(len).astype("int64"),
        })
        return d.groupby(["modality", "shard"], sort=False).agg(
            n_items=("doc_id", "size"), total_bytes=("nb", "sum"),
            min_doc_id=("doc_id", "min"), max_doc_id=("doc_id", "max"),
        ).reset_index()

    parts = payloads.map_batches(
        partial, batch_format="pandas", batch_size=2048
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["modality", "shard"], sort=False).agg(
            n_items=("n_items", "sum"), total_bytes=("total_bytes", "sum"),
            min_doc_id=("min_doc_id", "min"), max_doc_id=("max_doc_id", "max"),
        ).reset_index()
        for c in ("shard", "n_items", "total_bytes", "min_doc_id",
                  "max_doc_id"):
            g[c] = g[c].astype("int64")
        return g

    return bucketed_group_apply(
        parts, ["modality", "shard"], merge, n_buckets=4
    )


SHARD_MANIFEST_SQL_TEMPLATE = """
WITH p AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS modality,
         doc_id % {n_shards} AS shard,
         octet_length(encode(text)) AS nb
  FROM documents WHERE text IS NOT NULL
)
SELECT modality, CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(nb) AS BIGINT) AS total_bytes,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
FROM p GROUP BY modality, shard
"""


def payload_dedup_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Content-addressable-store planning summary for a payload corpus:
    how many payloads are byte-identical copies and what a digest-keyed
    store saves — n_payloads, n_unique, n_dup_copies, bytes_total,
    bytes_unique, dedup_ratio (one row; the ``dedup_exact`` question asked
    of the binary column, sized for the CAS/shard planner rather than the
    curation funnel).

    Digest = md5 of the payload bytes through the batched DuckDB kernel
    (``functions/digest.md5_hex`` — for the fake codec payload ==
    encode(text), so the oracle's md5(text) is the same digest by
    construction). Shape: per-batch per-digest partials, one digest-keyed
    reduce folding each bucket to ONE scalar-partial row, one final
    single-bucket sum. n*nb products stay int64 (copies x payload bytes
    < 2^63 — a million copies of a terabyte payload before wrap)."""
    from tcx2graph_jl_ray.functions.digest import md5_hex
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    payloads = attach_fake_payload(docs)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        nb = batch["payload"].map(len).astype("int64")
        # fake-codec payload is encode(text): hash the decoded form through
        # the batched kernel (bit-identical to hashing the bytes)
        dg = md5_hex([bytes(p).decode() for p in batch["payload"]])
        d = pd.DataFrame({"dg": dg, "n": np.int64(1), "nb": nb})
        return d.groupby("dg", sort=False).agg(
            n=("n", "sum"), nb=("nb", "min")
        ).reset_index()

    parts = payloads.map_batches(
        partial, batch_format="pandas", batch_size=2048
    )

    def fold_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("dg", sort=False).agg(
            n=("n", "sum"), nb=("nb", "min")
        )
        n = g["n"].astype("int64").to_numpy()
        nb = g["nb"].astype("int64").to_numpy()
        return pd.DataFrame({
            "n_payloads": [np.int64(n.sum())],
            "n_unique": [np.int64(len(g))],
            "n_dup_copies": [np.int64((n - 1).sum())],
            "bytes_total": [np.int64((n * nb).sum())],
            "bytes_unique": [np.int64(nb.sum())],
        })

    scalar_parts = bucketed_group_apply(parts, ["dg"], fold_bucket,
                                        n_buckets=16)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.sum()
        bt = int(s["bytes_total"])
        bu = int(s["bytes_unique"])
        return pd.DataFrame({
            "n_payloads": [np.int64(s["n_payloads"])],
            "n_unique": [np.int64(s["n_unique"])],
            "n_dup_copies": [np.int64(s["n_dup_copies"])],
            "bytes_total": [np.int64(bt)],
            "bytes_unique": [np.int64(bu)],
            "dedup_ratio": [np.round(float(bu) / float(bt), 6)],
        })

    keyed = scalar_parts.map_batches(
        lambda b: b.assign(k=np.int64(0)), batch_format="pandas"
    )
    return bucketed_group_apply(
        keyed, ["k"], lambda b: final(b.drop(columns=["k"])), n_buckets=1
    )


PAYLOAD_DEDUP_SQL = """
WITH p AS (
  SELECT md5(text) AS dg, octet_length(encode(text)) AS nb
  FROM documents WHERE text IS NOT NULL
),
g AS (SELECT dg, COUNT(*) AS n, MIN(nb) AS nb FROM p GROUP BY dg)
SELECT CAST(SUM(n) AS BIGINT) AS n_payloads,
       CAST(COUNT(*) AS BIGINT) AS n_unique,
       CAST(SUM(n - 1) AS BIGINT) AS n_dup_copies,
       CAST(SUM(n * nb) AS BIGINT) AS bytes_total,
       CAST(SUM(nb) AS BIGINT) AS bytes_unique,
       ROUND(CAST(SUM(nb) AS DOUBLE) / CAST(SUM(n * nb) AS DOUBLE), 6)
         AS dedup_ratio
FROM g
"""


def resized_fingerprints(
    docs: ray.data.Dataset, width: int = 32, height: int = 8
) -> ray.data.Dataset:
    """Oracle-checkable surface of the ``resize_payloads`` actor-pool
    stage: per doc, the resized payload's byte count and the four 16-bit
    lanes of its md5 lower half — the content fingerprint a CAS store
    keys resized renditions by (the ``payload_feature_table`` contract
    applied AFTER the geometry change, proving the resize transform, not
    just the decode, end-to-end). Fake-codec resize cycles the payload
    bytes to width*height; the digest runs through the batched DuckDB
    kernel (``functions/digest.md5_low64``; ASCII corpus assumption — the
    cycled slice of a multi-byte char would not round-trip decode()).
    Output: doc_id, n_bytes, fp0..fp3 (int64)."""
    resized = resize_payloads(
        attach_fake_payload(docs), width, height
    )

    def fingerprint(batch: pd.DataFrame) -> pd.DataFrame:
        from tcx2graph_jl_ray.functions.digest import md5_low64

        texts = [bytes(p).decode() for p in batch["payload"]]
        lo = md5_low64(texts)
        out = {
            "doc_id": batch["doc_id"].astype("int64").to_numpy(),
            "n_bytes": batch["payload"].map(len).astype("int64").to_numpy(),
        }
        for j in range(4):
            out[f"fp{j}"] = (
                (lo >> np.uint64(16 * j)) & np.uint64(0xFFFF)
            ).astype("int64")
        return pd.DataFrame(out)

    return resized.map_batches(
        fingerprint, batch_format="pandas", batch_size=2048
    )


RESIZED_FP_SQL_TEMPLATE = """
WITH p AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n
  FROM documents WHERE text IS NOT NULL
),
r AS (
  SELECT doc_id,
         substr(repeat(text, CAST(({target} + n - 1) // n AS INTEGER)),
                1, {target}) AS rp
  FROM p
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(octet_length(encode(rp)) AS BIGINT) AS n_bytes,
       CAST((md5_number_lower(rp) >> 0)  & 65535 AS BIGINT) AS fp0,
       CAST((md5_number_lower(rp) >> 16) & 65535 AS BIGINT) AS fp1,
       CAST((md5_number_lower(rp) >> 32) & 65535 AS BIGINT) AS fp2,
       CAST((md5_number_lower(rp) >> 48) & 65535 AS BIGINT) AS fp3
FROM r
"""


def orientation_profile(
    payloads: ray.data.Dataset, n_buckets: int = 1
) -> ray.data.Dataset:
    """Metadata-only ORIENTATION / RESOLUTION profile of a payload table:
    per (format, orientation) — landscape, portrait, square, or degenerate
    (a zero dimension) — the payload count, share, and total pixel area.
    This is the batch-planning read-out a resize/decode fleet sizes its
    actor pools and batch sizes from (portrait vs landscape picks the
    resize kernel path; degenerate rows route to quarantine), and it needs
    NO decode — width/height ride the typed metadata columns, so the scan
    is column-pruned away from the binary payload entirely (the 100 TB
    point: never touch bytes you don't decode). Counts/areas exact ints;
    share one division rounded 6.
    Output: format, orientation, n_payloads, share, sum_pixels."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["width"].to_numpy(dtype="int64")
        h = batch["height"].to_numpy(dtype="int64")
        orient = np.where(
            (w == 0) | (h == 0), "degenerate",
            np.where(w > h, "landscape",
                     np.where(w < h, "portrait", "square")),
        )
        d = pd.DataFrame({
            "format": batch["format"],
            "orientation": orient,
            "n": np.int64(1),
            "pixels": w * h,
        })
        return d.groupby(["format", "orientation"], sort=False).sum()\
            .reset_index()

    parts = payloads.select_columns(["format", "width", "height"])\
        .map_batches(partial, batch_format="pandas", batch_size=65536)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["format", "orientation"], sort=False).sum()\
            .reset_index()
        tot = float(g["n"].sum())
        return pd.DataFrame({
            "format": g["format"],
            "orientation": g["orientation"],
            "n_payloads": g["n"].astype("int64"),
            "share": np.round(g["n"].to_numpy(dtype="float64") / tot, 6),
            "sum_pixels": g["pixels"].astype("int64"),
        })

    # single merge bucket: the share denominator is global; the cell space
    # (formats x 4 orientations) is tiny and partials are combiners
    return bucketed_group_apply(parts, ["format"], merge,
                                n_buckets=n_buckets)


# oracle over the documents-derived fake payload (attach_fake_payload:
# width = len(text) % 640, height = len(text) % 480, one FAKE_FORMAT)
ORIENTATION_PROFILE_SQL_TEMPLATE = """
WITH meta AS (
  SELECT CAST(length(text) % 640 AS BIGINT) AS w,
         CAST(length(text) % 480 AS BIGINT) AS h
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT '{fmt}' AS format,
         CASE WHEN w = 0 OR h = 0 THEN 'degenerate'
              WHEN w > h THEN 'landscape'
              WHEN w < h THEN 'portrait'
              ELSE 'square' END AS orientation,
         COUNT(*) AS n, SUM(w * h) AS pixels
  FROM meta GROUP BY 1, 2
)
SELECT format, orientation, CAST(n AS BIGINT) AS n_payloads,
       ROUND(CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER (), 6)
         AS share,
       CAST(pixels AS BIGINT) AS sum_pixels
FROM c
"""


def payload_size_hist(
    docs: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """Payload SIZE spectrum by modality: log2 histogram of payload byte
    lengths — the batch-size planning table for binary columns (the
    whole reason multimodal stages run small batches; the tail bin says
    how small). Byte lengths are exact ints off the payload column (the
    fake codec's UTF-8 bytes — real media swaps in transparently); the
    bin is the PURE-INTEGER ``bit_length`` rule; modality × ~30 bins
    bound every exchange. Output: modality, bin, min_bytes, n_payloads,
    total_bytes, share_in_modality."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    payloads = attach_fake_payload(docs)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        doc = batch["doc_id"].astype("int64")
        nbytes = pd.Series(
            [len(p) for p in batch["payload"]], index=batch.index
        ).astype("int64")
        bins = np.array([int(b + 1).bit_length() - 1 for b in nbytes],
                        dtype="int64")
        d = pd.DataFrame({
            "modality": doc.mod(3).map(dict(enumerate(MODALITIES))),
            "bin": bins,
            "n": np.int64(1),
            "tb": nbytes,
        })
        return d.groupby(["modality", "bin"], sort=False).sum()\
            .reset_index()

    parts = payloads.map_batches(partial, batch_format="pandas",
                                 batch_size=2048)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["modality", "bin"], sort=False)[["n", "tb"]]\
            .sum().reset_index()
        tot = g.groupby("modality", sort=False)["n"].transform("sum")
        b = g["bin"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "modality": g["modality"],
            "bin": g["bin"].astype("int64"),
            "min_bytes": ((np.int64(1) << b) - 1).astype("int64"),
            "n_payloads": g["n"].astype("int64"),
            "total_bytes": g["tb"].astype("int64"),
            "share_in_modality": np.round(
                g["n"].to_numpy(dtype="float64")
                / tot.to_numpy(dtype="float64"), 6),
        })

    # ONE bucket: the within-modality denominator; 3 x ~30 rows
    return bucketed_group_apply(parts, ["modality"], final, n_buckets=1)


PAYLOAD_SIZE_HIST_SQL = """
WITH p AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS nbytes,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS modality
  FROM documents WHERE text IS NOT NULL
),
h AS (
  SELECT modality, CAST(floor(log2(nbytes + 1)) AS BIGINT) AS bin,
         COUNT(*) AS n, SUM(nbytes) AS tb
  FROM p GROUP BY 1, 2
)
SELECT modality, bin, CAST(POWER(2, bin) AS BIGINT) - 1 AS min_bytes,
       CAST(n AS BIGINT) AS n_payloads, CAST(tb AS BIGINT) AS total_bytes,
       ROUND(CAST(n AS DOUBLE)
             / SUM(CAST(n AS DOUBLE)) OVER (PARTITION BY modality), 6)
         AS share_in_modality
FROM h
"""


def chunk_dedup_stats(
    docs: ray.data.Dataset, chunk_chars: int = 64
) -> ray.data.Dataset:
    """CHUNK-level content-addressable-store planning summary: split every
    payload into fixed-size chunks, digest each, and report how much a
    chunk-keyed store saves vs whole-payload storage — the fixed-window
    variant of content-defined chunking, the layer BELOW
    ``payload_dedup_stats`` (two payloads that are not byte-identical can
    still share most chunks, e.g. a re-encoded prefix + identical body).

    Fake-codec payloads are encode(text), so the chunk boundary is defined
    on the decoded form (``chunk_chars`` characters — what DuckDB's
    character-based substring reproduces exactly; a byte boundary could
    split a multi-byte char and have no SQL mirror); chunk byte size is the
    UTF-8 length of the chunk. Shape: per-batch chunk explode + per-digest
    partials, one digest-keyed bucketed fold to scalar partials, one final
    single-bucket sum — nothing corpus-sized leaves the workers. Output one
    row: n_payloads, n_chunks, n_unique_chunks, n_dup_chunks, bytes_total,
    bytes_unique, dedup_ratio."""
    from tcx2graph_jl_ray.functions.digest import md5_hex
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    payloads = attach_fake_payload(docs)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        texts = [bytes(p).decode() for p in batch["payload"]]
        chunks: list[str] = []
        for t in texts:
            chunks.extend(
                t[i: i + chunk_chars] for i in range(0, len(t), chunk_chars)
            )
        if chunks:
            dg = md5_hex(np.asarray(chunks, dtype=object))
            nb = np.fromiter(
                (len(c.encode()) for c in chunks), dtype="int64",
                count=len(chunks),
            )
            d = pd.DataFrame({"dg": dg, "n": np.int64(1), "nb": nb})
            g = d.groupby("dg", sort=False).agg(
                n=("n", "sum"), nb=("nb", "min")
            ).reset_index()
        else:
            g = pd.DataFrame({
                "dg": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
                "nb": pd.Series([], dtype="int64"),
            })
        g["np_"] = np.zeros(len(g), dtype="int64")
        # carry the payload count on a dedicated sentinel row (dg="" is never
        # a real 32-hex digest; n=0 rows are excluded from chunk stats in the
        # fold), so batches of chunkless (empty-text) payloads still count
        carrier = pd.DataFrame({
            "dg": [""], "n": [np.int64(0)], "nb": [np.int64(0)],
            "np_": [np.int64(len(texts))],
        })
        return pd.concat([g, carrier], ignore_index=True)

    parts = payloads.map_batches(
        partial, batch_format="pandas", batch_size=2048
    )

    def fold_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        real = bucket[bucket["n"] > 0]
        g = real.groupby("dg", sort=False).agg(
            n=("n", "sum"), nb=("nb", "min")
        )
        n = g["n"].astype("int64").to_numpy()
        nb = g["nb"].astype("int64").to_numpy()
        return pd.DataFrame({
            "n_payloads": [np.int64(bucket["np_"].sum())],
            "n_chunks": [np.int64(n.sum())],
            "n_unique_chunks": [np.int64(len(g))],
            "bytes_total": [np.int64((n * nb).sum())],
            "bytes_unique": [np.int64(nb.sum())],
        })

    scalar_parts = bucketed_group_apply(parts, ["dg"], fold_bucket,
                                        n_buckets=16)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.sum()
        bt = int(s["bytes_total"])
        bu = int(s["bytes_unique"])
        nc = int(s["n_chunks"])
        nu = int(s["n_unique_chunks"])
        return pd.DataFrame({
            "n_payloads": [np.int64(s["n_payloads"])],
            "n_chunks": [np.int64(nc)],
            "n_unique_chunks": [np.int64(nu)],
            "n_dup_chunks": [np.int64(nc - nu)],
            "bytes_total": [np.int64(bt)],
            "bytes_unique": [np.int64(bu)],
            "dedup_ratio": [np.round(float(bu) / float(bt), 6)],
        })

    keyed = scalar_parts.map_batches(
        lambda b: b.assign(k=np.int64(0)), batch_format="pandas"
    )
    return bucketed_group_apply(
        keyed, ["k"], lambda b: final(b.drop(columns=["k"])), n_buckets=1
    )


CHUNK_DEDUP_SQL_TEMPLATE = """
WITH d AS (SELECT text FROM documents WHERE text IS NOT NULL),
e AS (
  SELECT text,
         unnest(range(
           1, CAST(ceil(length(text) / {chunk_chars}.0) AS BIGINT) + 1
         )) AS g
  FROM d
),
c AS (
  SELECT substring(
           text, CAST((g - 1) * {chunk_chars} + 1 AS BIGINT), {chunk_chars}
         ) AS chunk
  FROM e
),
g AS (
  SELECT md5(chunk) AS dg, COUNT(*) AS n,
         MIN(octet_length(encode(chunk))) AS nb
  FROM c GROUP BY 1
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_payloads,
       CAST(SUM(n) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) AS BIGINT) AS n_unique_chunks,
       CAST(SUM(n - 1) AS BIGINT) AS n_dup_chunks,
       CAST(SUM(n * nb) AS BIGINT) AS bytes_total,
       CAST(SUM(nb) AS BIGINT) AS bytes_unique,
       ROUND(CAST(SUM(nb) AS DOUBLE) / CAST(SUM(n * nb) AS DOUBLE), 6)
         AS dedup_ratio
FROM g
"""


def phash_dup_groups(
    docs: ray.data.Dataset, n_cells: int = 64, n_buckets: int = 32
) -> ray.data.Dataset:
    """PERCEPTUAL-HASH duplicate groups over the payload column — aHash
    (average hash), the cheapest image near-dup detector: sample a fixed
    grid of cells from the decoded payload, set bit i when cell i is
    above the payload mean, group payloads by the 64-bit fingerprint.
    Fake-codec "decode" reads the first ``n_cells`` character codes of
    the payload text (SQL mirror: ascii(substring)); the threshold is the
    ALL-INTEGER cross-multiplication code_i * n >= sum(codes) — no float
    mean is ever formed, so the fingerprint is bit-exact everywhere.
    Payloads shorter than the grid are skipped (no stable fingerprint).
    Output per fingerprint with >1 member: fp (int64), n_payloads,
    min_doc_id (the canonical representative)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    payloads = attach_fake_payload(docs)

    def fingerprint(batch: pd.DataFrame) -> pd.DataFrame:
        ids, fps = [], []
        weights = np.int64(1) << np.arange(n_cells, dtype="uint64")
        for i, p in zip(batch["doc_id"].astype("int64"), batch["payload"]):
            t = bytes(p).decode()
            if len(t) < n_cells:
                continue
            codes = np.array([ord(ch) for ch in t[:n_cells]], dtype="int64")
            bits = (codes * n_cells) >= codes.sum()
            # pack into one int64 (bit 63 may set the sign — harmless, the
            # value is an opaque key on both sides)
            fp = np.int64(
                np.bitwise_or.reduce(
                    (weights[bits]).astype("uint64"), initial=np.uint64(0)
                ).astype("int64")
            ) if bits.any() else np.int64(0)
            ids.append(int(i))
            fps.append(int(fp))
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "fp": pd.Series(fps, dtype="int64"),
            "n": pd.Series([1] * len(ids), dtype="int64"),
        })

    parts = payloads.map_batches(
        fingerprint, batch_format="pandas", batch_size=2048
    )

    def per_fp(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("fp", sort=False).agg(
            n_payloads=("n", "sum"), min_doc_id=("doc_id", "min")
        ).reset_index()
        g = g[g["n_payloads"] > 1]
        for c in ("fp", "n_payloads", "min_doc_id"):
            g[c] = g[c].astype("int64")
        return g

    return bucketed_group_apply(parts, ["fp"], per_fp, n_buckets=n_buckets)


PHASH_DUPS_SQL_TEMPLATE = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text
  FROM documents WHERE text IS NOT NULL AND length(text) >= {n_cells}
),
cells AS (
  SELECT doc_id,
         unnest(range(1, {n_cells} + 1)) AS i,
         text
  FROM d
),
codes AS (
  SELECT doc_id, i,
         ascii(substring(text, CAST(i AS BIGINT), 1)) AS code
  FROM cells
),
tot AS (SELECT doc_id, SUM(code) AS s FROM codes GROUP BY doc_id),
bits AS (
  SELECT c.doc_id,
         SUM(CASE WHEN c.code * {n_cells} >= t.s
                  THEN CAST(1 AS HUGEINT) << (c.i - 1)
                  ELSE CAST(0 AS HUGEINT) END) AS fp_h
  FROM codes c JOIN tot t ON t.doc_id = c.doc_id
  GROUP BY c.doc_id
),
fps AS (
  SELECT doc_id,
         CAST(fp_h - CASE WHEN fp_h >= (CAST(1 AS HUGEINT) << 63)
                          THEN (CAST(1 AS HUGEINT) << 64)
                          ELSE 0 END AS BIGINT) AS fp
  FROM bits
)
SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_payloads,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM fps GROUP BY fp HAVING COUNT(*) > 1
"""
