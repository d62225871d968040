"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as opaque ``binary`` columns with typed
metadata, processed by actor-pool ``map_batches`` stages — the same
shape a model-backed decode would use (state loaded once per actor in
``__init__``, batched work in ``__call__``).  The decode kernels
themselves are STUBBED (no media libraries in this container): a real
deployment swaps ``_decode_impl`` for PIL/torchaudio/ffmpeg while every
Ray-side concern — schema, batch sizing, actor pool signature, output
layout, error routing — stays exactly as tested here.

``DeterministicFakeDecoder`` produces a seeded, content-derived feature
vector so the plumbing is testable end-to-end without media libs;
``MediaDecoder(strict=True)`` raises NotImplementedError at the decode
step, marking the boundary explicitly.

Two modalities ARE decoded for real: ``WavFeatureExtractor`` parses
RIFF/WAVE 16-bit PCM payloads with the stdlib ``wave`` module (header
fields + a vectorized numpy frame scan for peak amplitude), and
``PpmImageDecoder`` / ``PpmResizer`` parse binary netpbm (PPM/PGM)
image payloads (header tokens + numpy raster scan; nearest-neighbor
resample for the resize stage) — no media library needed — so the audio
and image paths are genuine bytes-in/features-out decode stages,
oracle-checkable end to end.  Malformed payloads route to
``decoded = 0`` rows (per-row error tolerance, the reference's silent
per-file catch analogue, MainViewModel.cs:932-935).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pyarrow as pa

import ray.data

#: canonical media-table schema: payload is opaque binary; metadata typed
MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("kind", pa.string()),          # 'image' | 'audio' | 'video'
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),          # images/video
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),    # audio
    ("duration_ms", pa.int64()),    # audio/video
])


class MediaDecoder:
    """Actor-pool decode stage (strict): raises at the decode boundary.

    Use with
    ``ds.map_batches(MediaDecoder, fn_constructor_kwargs={...},
    concurrency=(1, N), num_cpus=1, batch_size=B)`` — batch_size must be
    small for large payloads (payload_bytes * batch_size * concurrency
    bounds worker heap)."""

    def __init__(self, feature_dim: int = 64, strict: bool = True) -> None:
        # a real implementation loads the model / codec context HERE,
        # once per actor
        self.feature_dim = feature_dim
        self.strict = strict

    def _decode_impl(self, payload: bytes, kind: str) -> np.ndarray:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in "
            "this environment; swap _decode_impl for a real decoder")

    def __call__(self, t: pa.Table) -> pa.Table:
        feats: list[list[float] | None] = []
        errs: list[str | None] = []
        for payload, kind in zip(t["payload"].to_pylist(),
                                 t["kind"].to_pylist()):
            if payload is None:
                feats.append(None)
                errs.append("null payload")
                continue
            try:
                v = self._decode_impl(payload, kind)
                feats.append([float(x) for x in v])
                errs.append(None)
            except NotImplementedError:
                raise
            except Exception as e:  # error rows flow, never abort the batch
                feats.append(None)
                errs.append(f"{type(e).__name__}: {e}")
        return pa.table({
            "media_id": t["media_id"],
            "kind": t["kind"],
            "feature": pa.array(feats, pa.list_(pa.float32())),
            "decode_error": pa.array(errs, pa.string()),
        })


class DeterministicFakeDecoder(MediaDecoder):
    """Deterministic stand-in decode: a content-derived pseudo-feature
    (blake2b-seeded) so the actor-pool plumbing is testable end-to-end."""

    def _decode_impl(self, payload: bytes, kind: str) -> np.ndarray:
        seed = int.from_bytes(
            hashlib.blake2b(payload, digest_size=8).digest(), "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.feature_dim).astype(np.float32)


def decode_features(ds: ray.data.Dataset, feature_dim: int = 64,
                    batch_size: int = 64, concurrency=(1, 4),
                    decoder_cls=DeterministicFakeDecoder) -> ray.data.Dataset:
    """Media table -> (media_id, kind, feature, decode_error).

    Small batch_size: payloads are large binaries, so batch bytes — not
    row count — is the memory unit."""
    return ds.map_batches(
        decoder_cls,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def wav_bytes(sample_rate: int, n_channels: int, n_frames: int,
              amplitude: int) -> bytes:
    """Canonical 16-bit PCM RIFF/WAVE payload: ``n_frames`` frames of a
    constant ``amplitude`` sample on every channel (stdlib ``wave``
    writer, so the container is well-formed by construction).  Used by
    tests/fixtures; the extractor below never sees this code path — it
    parses the bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack("<h", amplitude) * (n_frames * n_channels))
    return buf.getvalue()


class WavFeatureExtractor:
    """Actor-pool ``map_batches`` stage decoding RIFF/WAVE 16-bit PCM
    payloads into typed audio features — the REAL decode path (stdlib
    ``wave`` header parse + numpy frame scan; no media libs required).

    Input columns:  ``id_col`` (int64), ``payload`` (binary).
    Output columns: id_col, sample_rate, n_channels, n_frames,
    duration_us (integer floor of frames*1e6/rate), peak_amp
    (max |sample| over all channels), decoded (1/0) — all int64 so a
    DuckDB oracle hash-matches exactly.  Malformed / truncated / null
    payloads yield a decoded=0 row with null features (never abort the
    batch).  Decode is inherently per-payload; the numpy scan keeps the
    per-frame work vectorized."""

    def __init__(self, id_col: str = "doc_id") -> None:
        self.id_col = id_col  # a real codec would load its context here

    def _parse(self, payload: bytes) -> tuple[int, int, int, int, int]:
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            ch = w.getnchannels()
            nf = w.getnframes()
            if w.getsampwidth() != 2:
                raise ValueError("only 16-bit PCM supported")
            frames = w.readframes(nf)
        if len(frames) < 2 * nf * ch:
            raise ValueError("truncated frame data")
        samples = np.frombuffer(frames, dtype="<i2")
        peak = int(np.abs(samples.astype(np.int32)).max()) if samples.size else 0
        return rate, ch, nf, nf * 1_000_000 // max(rate, 1), peak

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols: dict[str, list] = {k: [None] * n for k in
                                 ("sample_rate", "n_channels", "n_frames",
                                  "duration_us", "peak_amp")}
        decoded = [0] * n
        for i, payload in enumerate(t["payload"].to_pylist()):
            if payload is None:
                continue
            try:
                vals = self._parse(payload)
            except (wave.Error, EOFError, ValueError, struct.error):
                continue  # decoded stays 0, features stay null
            for k, v in zip(cols, vals):
                cols[k][i] = v
            decoded[i] = 1
        out = {self.id_col: t[self.id_col]}
        out.update({k: pa.array(v, pa.int64()) for k, v in cols.items()})
        out["decoded"] = pa.array(decoded, pa.int64())
        return pa.table(out)


def wav_features(ds: ray.data.Dataset, id_col: str = "doc_id",
                 batch_size: int = 64,
                 concurrency=(1, 4)) -> ray.data.Dataset:
    """(id, payload) media table -> typed audio features via the real
    stdlib WAV decoder.  Small batch_size: payload bytes, not row count,
    is the worker-heap unit."""
    return ds.map_batches(
        WavFeatureExtractor,
        fn_constructor_kwargs={"id_col": id_col},
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def ppm_bytes(width: int, height: int, value: int, channels: int = 3,
              maxval: int = 255) -> bytes:
    """Canonical binary PPM (P6, rgb) / PGM (P5, gray) payload: every
    sample equal to ``value`` — well-formed by construction, with a
    comment line in the header so parsers must handle them.  Used by
    tests/fixtures; the decoder below parses the bytes, never this
    code."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (PGM) or 3 (PPM)")
    magic = b"P6" if channels == 3 else b"P5"
    header = b"%s\n# synth\n%d %d\n%d\n" % (magic, width, height, maxval)
    nsamp = width * height * channels
    if maxval > 255:
        body = struct.pack(">H", value) * nsamp
    else:
        body = bytes([value]) * nsamp
    return header + body


class PpmImageDecoder:
    """Actor-pool ``map_batches`` stage decoding binary PPM (P6) / PGM
    (P5) image payloads into typed features — the second REAL decode
    path (pure header parse + numpy raster scan; no media libs).

    Input columns:  ``id_col`` (int64), ``payload`` (binary).
    Output columns: id_col, width, height, n_channels, maxval,
    pixel_sum (sum of all samples), peak_val (max sample), decoded
    (1/0) — all int64 so a DuckDB oracle hash-matches exactly.
    Malformed / truncated / null payloads yield decoded=0 rows with
    null features.  Handles 1- and 2-byte samples (maxval > 255 is
    big-endian per the netpbm spec) and ``#`` header comments."""

    _FEATS = ("width", "height", "n_channels", "maxval", "pixel_sum",
              "peak_val")

    def __init__(self, id_col: str = "doc_id") -> None:
        self.id_col = id_col  # a real codec would load its context here

    @staticmethod
    def _header_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
        """Parse n whitespace-separated ASCII ints after the magic,
        skipping '#' comments; returns (tokens, offset past the single
        whitespace byte that terminates the last token)."""
        toks: list[int] = []
        i = 2  # past magic
        cur = b""
        while len(toks) < n:
            if i >= len(payload):
                raise ValueError("truncated header")
            c = payload[i:i + 1]
            if c == b"#":
                while i < len(payload) and payload[i:i + 1] != b"\n":
                    i += 1
            elif c in b" \t\r\n":
                if cur:
                    toks.append(int(cur))
                    cur = b""
            elif c.isdigit():
                cur += c
            else:
                raise ValueError(f"bad header byte {c!r}")
            i += 1
        return toks, i

    def _parse(self, payload: bytes) -> tuple[int, ...]:
        magic = payload[:2]
        if magic == b"P6":
            ch = 3
        elif magic == b"P5":
            ch = 1
        else:
            raise ValueError(f"unsupported magic {magic!r}")
        (w, h, maxval), off = self._header_tokens(payload, 3)
        if not (0 < maxval < 65536) or w <= 0 or h <= 0:
            raise ValueError("bad dimensions")
        nsamp = w * h * ch
        dtype = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
        raster = payload[off:off + nsamp * dtype.itemsize]
        if len(raster) < nsamp * dtype.itemsize:
            raise ValueError("truncated raster")
        samples = np.frombuffer(raster, dtype=dtype)
        return (w, h, ch, maxval, int(samples.sum(dtype=np.int64)),
                int(samples.max()) if samples.size else 0)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols: dict[str, list] = {k: [None] * n for k in self._FEATS}
        decoded = [0] * n
        for i, payload in enumerate(t["payload"].to_pylist()):
            if payload is None:
                continue
            try:
                vals = self._parse(payload)
            except (ValueError, struct.error):
                continue  # decoded stays 0, features stay null
            for k, v in zip(cols, vals):
                cols[k][i] = v
            decoded[i] = 1
        out = {self.id_col: t[self.id_col]}
        out.update({k: pa.array(v, pa.int64()) for k, v in cols.items()})
        out["decoded"] = pa.array(decoded, pa.int64())
        return pa.table(out)


def image_features(ds: ray.data.Dataset, id_col: str = "doc_id",
                   batch_size: int = 64,
                   concurrency=(1, 4)) -> ray.data.Dataset:
    """(id, payload) media table -> typed image features via the real
    netpbm decoder.  Small batch_size: payload bytes, not row count, is
    the worker-heap unit."""
    return ds.map_batches(
        PpmImageDecoder,
        fn_constructor_kwargs={"id_col": id_col},
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )


class PpmResizer(PpmImageDecoder):
    """Actor-pool resize stage: decode netpbm payload, nearest-neighbor
    resample to (out_w, out_h) with the classic integer grid map
    src = floor(dst * in / out), re-encode as a minimal netpbm payload.
    Output: id, payload (resized bytes), width, height, decoded —
    malformed inputs route to decoded=0 with null payload.  The resample
    itself is one numpy fancy-index per image; per-payload iteration is
    inherent to opaque binary columns (same posture as the decoders)."""

    def __init__(self, out_w: int = 32, out_h: int = 32,
                 id_col: str = "doc_id") -> None:
        super().__init__(id_col)
        self.out_w, self.out_h = out_w, out_h

    def _resize(self, payload: bytes) -> bytes:
        magic = payload[:2]
        ch = {b"P6": 3, b"P5": 1}.get(magic)
        if ch is None:
            raise ValueError(f"unsupported magic {magic!r}")
        (w, h, maxval), off = self._header_tokens(payload, 3)
        if not (0 < maxval < 65536) or w <= 0 or h <= 0:
            raise ValueError("bad dimensions")
        dtype = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
        nsamp = w * h * ch
        raster = payload[off:off + nsamp * dtype.itemsize]
        if len(raster) < nsamp * dtype.itemsize:
            raise ValueError("truncated raster")
        img = np.frombuffer(raster, dtype=dtype).reshape(h, w, ch)
        ys = (np.arange(self.out_h) * h) // self.out_h
        xs = (np.arange(self.out_w) * w) // self.out_w
        out = img[ys[:, None], xs[None, :]]
        header = b"%s\n%d %d\n%d\n" % (magic, self.out_w, self.out_h, maxval)
        return header + out.tobytes()

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        payloads: list[bytes | None] = [None] * n
        decoded = [0] * n
        for i, payload in enumerate(t["payload"].to_pylist()):
            if payload is None:
                continue
            try:
                payloads[i] = self._resize(payload)
            except (ValueError, struct.error):
                continue
            decoded[i] = 1
        return pa.table({
            self.id_col: t[self.id_col],
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([self.out_w if d else None for d in decoded],
                              pa.int64()),
            "height": pa.array([self.out_h if d else None for d in decoded],
                               pa.int64()),
            "decoded": pa.array(decoded, pa.int64()),
        })


def resize_images(ds: ray.data.Dataset, out_w: int = 32, out_h: int = 32,
                  id_col: str = "doc_id", batch_size: int = 64,
                  concurrency=(1, 4)) -> ray.data.Dataset:
    """(id, payload) -> (id, resized payload, width, height, decoded)
    via nearest-neighbor netpbm resize (actor pool, small batches)."""
    return ds.map_batches(
        PpmResizer,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h,
                               "id_col": id_col},
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def frame_sample_plan(duration_ms: int, every_ms: int = 1000,
                      max_frames: int = 32) -> list[int]:
    """Deterministic frame-sampling timestamps for a video payload (the
    plan is real; extracting frames is part of the stubbed decode)."""
    if duration_ms <= 0:
        return []
    ts = list(range(0, duration_ms, every_ms))[:max_frames]
    return ts


def synth_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    import random
    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(rng.randint(64, 512)))
        rows["media_id"].append(f"m{i:06d}")
        rows["kind"].append(kind)
        rows["payload"].append(payload if i % 17 else None)  # some nulls
        rows["mime"].append({"image": "image/jpeg", "audio": "audio/wav",
                             "video": "video/mp4"}[kind])
        rows["width"].append(640 if kind != "audio" else None)
        rows["height"].append(480 if kind != "audio" else None)
        rows["sample_rate"].append(16000 if kind == "audio" else None)
        rows["duration_ms"].append(rng.randint(1000, 60000)
                                   if kind != "image" else None)
    return pa.table(rows, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Image perceptual-hash (dHash) near-duplicate tier: the multimodal analogue
# of the SimHash text tier — a 64-bit gradient fingerprint per image, then
# Hamming-block candidate buckets (Manku et al. 2007 pigeonhole) and a
# distributed union-find, so no all-pairs image comparison exists anywhere.
# ---------------------------------------------------------------------------

#: dHash grid — 8x8 horizontal gradients over a 9x8 grayscale thumbnail
_DH_W, _DH_H = 8, 8


class ImageDHasher(PpmImageDecoder):
    """Actor-pool stage computing a 64-bit dHash (difference hash) per
    netpbm image payload: decode, channel-sum to grayscale, nearest-
    neighbor resample to a (9 x 8) thumbnail, then bit (y*8+x) = 1 iff
    thumb[y, x] < thumb[y, x+1].  The hash depends only on the ORDERING
    of neighboring luminances, so any monotone brightness change (gain,
    offset, gamma) maps to the identical hash, and small local edits
    flip only the few bits whose comparisons they touch — near-dup
    images land within a small Hamming distance (Krawetz 2013,
    "Kind of Like That", the public dHash description).

    Output columns: id_col, ``dhash`` (uint64) and ``decoded`` (int64);
    malformed / null payloads route to decoded=0, dhash=0 (excluded from
    candidate generation downstream, same error posture as the feature
    decoders / MainViewModel.cs:932-935's silent per-file catch)."""

    def _dhash(self, payload: bytes) -> int:
        magic = payload[:2]
        ch = {b"P6": 3, b"P5": 1}.get(magic)
        if ch is None:
            raise ValueError(f"unsupported magic {magic!r}")
        (w, h, maxval), off = self._header_tokens(payload, 3)
        if not (0 < maxval < 65536) or w <= 0 or h <= 0:
            raise ValueError("bad dimensions")
        dtype = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
        nsamp = w * h * ch
        raster = payload[off:off + nsamp * dtype.itemsize]
        if len(raster) < nsamp * dtype.itemsize:
            raise ValueError("truncated raster")
        img = np.frombuffer(raster, dtype=dtype).reshape(h, w, ch)
        # channel SUM is a monotone map of the mean — same comparisons,
        # no float division
        gray = img.astype(np.int64).sum(axis=2)
        ys = (np.arange(_DH_H) * h) // _DH_H
        xs = (np.arange(_DH_W + 1) * w) // (_DH_W + 1)
        thumb = gray[ys[:, None], xs[None, :]]
        bits = (thumb[:, 1:] < thumb[:, :-1]).ravel()
        return int.from_bytes(np.packbits(bits).tobytes(), "big")

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        hashes = [0] * n
        decoded = [0] * n
        for i, payload in enumerate(t["payload"].to_pylist()):
            if payload is None:
                continue
            try:
                hashes[i] = self._dhash(payload)
            except (ValueError, struct.error):
                continue
            decoded[i] = 1
        return pa.table({
            self.id_col: t[self.id_col],
            "dhash": pa.array(hashes, pa.uint64()),
            "decoded": pa.array(decoded, pa.int64()),
        })


def image_dhash(ds: ray.data.Dataset, id_col: str = "doc_id",
                batch_size: int = 64,
                concurrency=(1, 8)) -> ray.data.Dataset:
    """(id, payload) -> (id, dhash, decoded) via the dHash actor pool.
    Small batch_size: payload bytes, not row count, is the heap unit."""
    return ds.map_batches(
        ImageDHasher,
        fn_constructor_kwargs={"id_col": id_col},
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def image_dedup(ds: ray.data.Dataset, hamming: int = 2,
                id_col: str = "doc_id",
                num_partitions: int = 32) -> ray.data.Dataset:
    """Perceptual near-duplicate image DEDUP: dHash fingerprints ->
    Hamming-block clustering (see ``_phash_cluster``) -> the text
    pipelines' keep/delete/unique assignment contract over the image
    modality."""
    return _phash_cluster(image_dhash(ds, id_col=id_col), hamming,
                          id_col, "dhash", num_partitions)


class AudioEnvelopeHasher:
    """Actor-pool stage computing a 64-bit energy-envelope difference
    hash per RIFF/WAVE 16-bit PCM payload: decode (stdlib ``wave``),
    channel-sum to mono, split into 65 equal frame windows, sum |sample|
    per window (one cumsum, no per-window loop), then bit i = 1 iff
    window i+1's energy < window i's.  The hash depends only on the
    ORDERING of adjacent window energies, so any positive gain change
    (volume) maps to the identical hash — the audio analogue of the
    image dHash (same public difference-hash construction).

    Output columns: id_col, ``ahash`` (uint64), ``decoded`` (int64);
    malformed / null payloads route to decoded=0 (state='error'
    downstream)."""

    def __init__(self, id_col: str = "doc_id") -> None:
        self.id_col = id_col

    def _ahash(self, payload: bytes) -> int:
        with wave.open(io.BytesIO(payload), "rb") as w:
            ch = w.getnchannels()
            nf = w.getnframes()
            if w.getsampwidth() != 2:
                raise ValueError("only 16-bit PCM supported")
            frames = w.readframes(nf)
        if len(frames) < 2 * nf * ch:
            raise ValueError("truncated frame data")
        samples = np.abs(np.frombuffer(frames, dtype="<i2")
                         .astype(np.int64))
        if ch > 1:
            samples = samples.reshape(nf, ch).sum(axis=1)
        cum = np.concatenate([[0], np.cumsum(samples)])
        bounds = (np.arange(_DH_W * _DH_H + 2, dtype=np.int64) * nf) \
            // (_DH_W * _DH_H + 1)
        env = cum[bounds[1:]] - cum[bounds[:-1]]
        bits = env[1:] < env[:-1]
        return int.from_bytes(np.packbits(bits).tobytes(), "big")

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        hashes = [0] * n
        decoded = [0] * n
        for i, payload in enumerate(t["payload"].to_pylist()):
            if payload is None:
                continue
            try:
                hashes[i] = self._ahash(payload)
            except (wave.Error, EOFError, ValueError, struct.error):
                continue
            decoded[i] = 1
        return pa.table({
            self.id_col: t[self.id_col],
            "ahash": pa.array(hashes, pa.uint64()),
            "decoded": pa.array(decoded, pa.int64()),
        })


def audio_envelope_hash(ds: ray.data.Dataset, id_col: str = "doc_id",
                        batch_size: int = 64,
                        concurrency=(1, 8)) -> ray.data.Dataset:
    """(id, payload) -> (id, ahash, decoded) via the envelope-hash actor
    pool.  Small batch_size: payload bytes, not rows, is the heap unit."""
    return ds.map_batches(
        AudioEnvelopeHasher,
        fn_constructor_kwargs={"id_col": id_col},
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def audio_dedup(ds: ray.data.Dataset, hamming: int = 2,
                id_col: str = "doc_id",
                num_partitions: int = 32) -> ray.data.Dataset:
    """Perceptual near-duplicate audio DEDUP: envelope hashes ->
    Hamming-block clustering -> keep/delete/unique assignments — the
    audio analogue of ``image_dedup``."""
    return _phash_cluster(audio_envelope_hash(ds, id_col=id_col), hamming,
                          id_col, "ahash", num_partitions)


def _phash_cluster(hashes: ray.data.Dataset, hamming: int, id_col: str,
                   hash_col: str,
                   num_partitions: int) -> ray.data.Dataset:
    """Shared perceptual-hash clustering core: 64-bit fingerprints ->
    Hamming-block candidate buckets -> verified edges (popcount <=
    ``hamming``) -> connected components -> keep/delete/unique states
    with cluster_id = min member id.

    Scale shape (mirrors the SimHash text tier, pipeline.py
    simhash_edges): each fingerprint explodes into ``hamming+1``
    disjoint bit-block keys; two hashes within Hamming distance t agree
    on at least one of t+1 blocks (pigeonhole), so candidates come from
    a plain hash-partitioned groupby — never an all-pairs scan.
    Within-bucket verification is a vectorized uint64 XOR+popcount over
    the (small) bucket; undecoded rows are excluded from matching and
    surface as state='error'."""
    from .dist import groupapply, mix64, union_find

    hashes = hashes.materialize()
    n_blocks = hamming + 1
    width = 64 // n_blocks
    mask = np.uint64((1 << width) - 1)

    def _explode(t: pa.Table) -> pa.Table:
        keep = t.filter(pa.compute.equal(t["decoded"], 1))
        fp = keep[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = keep[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        o_key, o_id, o_fp = [], [], []
        for b in range(n_blocks):
            blk = (fp >> np.uint64(b * width)) & mask
            # mix block id into the key so identical values in different
            # blocks land in distinct buckets (collisions only add
            # popcount-verified candidates)
            with np.errstate(over="ignore"):
                o_key.append(mix64(blk + np.uint64(0x9E3779B97F4A7C15) *
                                   np.uint64(b + 1)))
            o_id.append(ids)
            o_fp.append(fp)
        return pa.table({
            "bkey": pa.array(np.concatenate(o_key), pa.uint64()),
            "node": pa.array(np.concatenate(o_id), pa.uint64()),
            "fp64": pa.array(np.concatenate(o_fp), pa.uint64()),
        })

    rows = hashes.map_batches(_explode, batch_format="pyarrow")

    def _part(t: pa.Table) -> pa.Table:
        from .dist import segments
        k = t["bkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        nodes = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
        fps = t["fp64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order, starts, _ = segments(k)
        out_u, out_v = [], []
        for s, e in zip(starts[:-1], starts[1:]):
            if e - s < 2:
                continue
            seg = order[s:e]
            nn, ff = nodes[seg], fps[seg]
            # in-bucket repeat suppression: one row per (node) suffices
            # since fp is a function of node
            nn, first = np.unique(nn, return_index=True)
            ff = ff[first]
            if len(nn) < 2:
                continue
            iu, iv = np.triu_indices(len(nn), k=1)
            x = ff[iu] ^ ff[iv]
            # vectorized 64-bit popcount via 8x uint8 view
            pc = np.unpackbits(x.view(np.uint8)).reshape(len(x), 64) \
                .sum(axis=1)
            ok = pc <= hamming
            out_u.append(nn[iu[ok]])
            out_v.append(nn[iv[ok]])
        if not out_u:
            return pa.table({"u": pa.array([], pa.uint64()),
                             "v": pa.array([], pa.uint64())})
        return pa.table({"u": pa.array(np.concatenate(out_u), pa.uint64()),
                         "v": pa.array(np.concatenate(out_v), pa.uint64())})

    edges = groupapply(rows, "bkey", _part, num_partitions)
    labels = union_find(edges, num_partitions).materialize()

    # labels are O(matched images) — bounded — so one broadcast join
    # assigns states (same posture as ann.embedding_dedup)
    ln_l = [np.array([], dtype=np.uint64)]
    lc_l = [np.array([], dtype=np.uint64)]
    for b in labels.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or "node" not in b.column_names:
            continue
        ln_l.append(b["node"].to_numpy(zero_copy_only=False).astype(np.uint64))
        lc_l.append(b["comp"].to_numpy(zero_copy_only=False).astype(np.uint64))
    ln, lc = np.concatenate(ln_l), np.concatenate(lc_l)
    o = np.argsort(ln)
    ln, lc = ln[o], lc[o]
    _, inv_c, cnt_c = np.unique(lc, return_inverse=True, return_counts=True)
    lsz = cnt_c[inv_c] if len(lc) else np.zeros(0, dtype=np.int64)
    import ray as _ray
    ref = _ray.put((ln, lc, lsz))

    def _assign(t: pa.Table) -> pa.Table:
        la, co, sz = _ray.get(ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dec = t["decoded"].to_numpy(zero_copy_only=False)
        u = ids.astype(np.uint64)
        pos = np.clip(np.searchsorted(la, u), 0, max(len(la) - 1, 0))
        hit = (la[pos] == u) if len(la) else np.zeros(len(u), dtype=bool)
        comp = np.where(hit, co[pos] if len(co) else 0, 0).astype(np.int64)
        state = np.where(dec == 0, "error",
                         np.where(~hit, "unique",
                                  np.where(ids == comp, "keep", "delete")))
        csize = np.where(hit, sz[pos] if len(sz) else 0, 1)
        csize = np.where(dec == 0, 0, csize)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "state": pa.array(state.tolist(), pa.string()),
            "cluster_id": pa.array(np.where(hit, comp, -1), pa.int64()),
            "cluster_size": pa.array(csize.astype(np.int64), pa.int64()),
        })

    return hashes.select_columns([id_col, "decoded"]).map_batches(
        _assign, batch_format="pyarrow").sort(id_col)


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2) video: real container parse, frame sampling, features
# ---------------------------------------------------------------------------

#: chroma-plane size as a (num, den) fraction of the luma plane
_Y4M_CHROMA = {"C420": (1, 4), "C420jpeg": (1, 4), "C420paldv": (1, 4),
               "C422": (1, 2), "C444": (1, 1), "Cmono": (0, 1)}


def _y4m_frame_size(width: int, height: int, cs: str) -> int:
    """Bytes per frame (8-bit samples): Y plane + two chroma planes.
    C42x sizes assume even dimensions (the fixtures guarantee it)."""
    num, den = _Y4M_CHROMA[cs]
    y = width * height
    return y + 2 * (y * num // den)


def y4m_bytes(width: int, height: int, lumas: list[int],
              fps: tuple[int, int] = (25, 1),
              colorspace: str = "C420") -> bytes:
    """Canonical YUV4MPEG2 payload: one frame per entry of ``lumas``,
    the whole Y plane filled with that value, chroma planes at 128 —
    well-formed by construction (Y4M is the PUBLIC uncompressed video
    interchange format of mjpegtools/ffmpeg: a text stream header, then
    per frame a ``FRAME\\n`` marker + fixed-size raw planes).  Used by
    tests/fixtures; the sampler/extractor below parse the bytes."""
    if colorspace not in _Y4M_CHROMA:
        raise ValueError(f"unsupported colorspace {colorspace}")
    head = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 %s\n" % (
        width, height, fps[0], fps[1], colorspace.encode())
    ysz = width * height
    csz = (_y4m_frame_size(width, height, colorspace) - ysz) // 2
    out = [head]
    for v in lumas:
        out.append(b"FRAME\n")
        out.append(bytes([v % 256]) * ysz + b"\x80" * (2 * csz))
    return b"".join(out)


def _y4m_parse_header(payload: bytes) -> tuple[int, int, int, int, str, int]:
    """(width, height, fps_num, fps_den, colorspace, body_offset) from a
    Y4M stream header; raises ValueError on malformed input."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M stream")
    w = h = fn = fd = -1
    cs = "C420"  # Y4M default when the C tag is absent
    for tok in payload[:nl].split(b" ")[1:]:
        if not tok:
            continue
        k, v = tok[:1], tok[1:]
        if k == b"W":
            w = int(v)
        elif k == b"H":
            h = int(v)
        elif k == b"F":
            a, b = v.split(b":")
            fn, fd = int(a), int(b)
        elif k == b"C":
            cs = "C" + v.decode()
            if cs not in _Y4M_CHROMA:
                raise ValueError(f"unknown colorspace {cs}")
    if w <= 0 or h <= 0 or fn <= 0 or fd <= 0:
        raise ValueError("missing W/H/F header fields")
    return w, h, fn, fd, cs, nl + 1


def _y4m_frames(payload: bytes) -> tuple[tuple, list[tuple[int, int]]]:
    """Parse a Y4M payload into (header fields, [(data_start, data_end)]
    per frame).  Validates every FRAME marker and a complete final
    frame; raises ValueError on truncation."""
    w, h, fn, fd, cs, off = _y4m_parse_header(payload)
    fsz = _y4m_frame_size(w, h, cs)
    spans: list[tuple[int, int]] = []
    pos = off
    while pos < len(payload):
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        nl = payload.find(b"\n", pos)
        if nl < 0 or nl > pos + 256:
            raise ValueError("unterminated FRAME header")
        start = nl + 1
        end = start + fsz
        if end > len(payload):
            raise ValueError("truncated frame")
        spans.append((start, end))
        pos = end
    return (w, h, fn, fd, cs, off), spans


class Y4mFrameSampler:
    """Actor-pool ``map_batches`` stage sampling every ``every_k``-th
    frame out of Y4M video payloads — the container-level frame-sample
    tier (the third REAL modality after WAV audio and netpbm images):
    the stream header and each frame are parsed from the BYTES and the
    kept frames re-emitted as a valid Y4M payload, so downstream stages
    (feature extract, perceptual hash) read the sample like any video.

    Input columns:  ``id_col`` (int64), ``payload`` (binary).
    Output columns: id_col, n_frames_in, n_frames_out, payload (the
    sampled Y4M stream; null when undecodable), decoded (1/0).
    Malformed / truncated / null payloads yield decoded=0 rows.  Decode
    is inherently per-payload; plane data moves by buffer slicing only
    (never decoded to pixels here)."""

    def __init__(self, every_k: int = 2, id_col: str = "doc_id") -> None:
        if every_k < 1:
            raise ValueError("every_k must be >= 1")
        self.k = every_k
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        n_in: list = [None] * n
        n_out: list = [None] * n
        outp: list = [None] * n
        decoded = [0] * n
        for i, payload in enumerate(t["payload"].to_pylist()):
            if payload is None:
                continue
            try:
                (_, _, _, _, _, off), spans = _y4m_frames(payload)
            except (ValueError, IndexError):
                continue
            head = payload[:off]
            kept = spans[::self.k]
            parts = [head]
            for s, e in kept:
                # re-emit a bare FRAME marker + the original plane bytes
                parts.append(b"FRAME\n")
                parts.append(payload[s:e])
            n_in[i], n_out[i] = len(spans), len(kept)
            outp[i] = b"".join(parts)
            decoded[i] = 1
        return pa.table({
            self.id_col: t[self.id_col],
            "n_frames_in": pa.array(n_in, pa.int64()),
            "n_frames_out": pa.array(n_out, pa.int64()),
            "payload": pa.array(outp, pa.binary()),
            "decoded": pa.array(decoded, pa.int64()),
        })


class Y4mFeatureExtractor:
    """Actor-pool ``map_batches`` stage decoding Y4M video payloads into
    typed features (header parse + numpy luma-plane scan; no media
    libs).

    Output columns: id_col, width, height, fps_num, fps_den, n_frames,
    duration_ms (floor n*1000*den/num), mean_luma (floor of the mean
    over every Y sample of every frame), peak_luma, decoded — all int64
    so a DuckDB oracle hash-matches exactly."""

    def __init__(self, id_col: str = "doc_id") -> None:
        self.id_col = id_col

    def _parse(self, payload: bytes) -> tuple[int, ...]:
        (w, h, fn, fd, cs, _off), spans = _y4m_frames(payload)
        ysz = w * h
        tot = 0
        peak = 0
        for s, _ in spans:
            y = np.frombuffer(payload, dtype=np.uint8, count=ysz, offset=s)
            tot += int(y.sum(dtype=np.int64))
            peak = max(peak, int(y.max()) if ysz else 0)
        nf = len(spans)
        mean = tot // (nf * ysz) if nf and ysz else 0
        return (w, h, fn, fd, nf, nf * 1000 * fd // fn, mean, peak)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        keys = ("width", "height", "fps_num", "fps_den", "n_frames",
                "duration_ms", "mean_luma", "peak_luma")
        cols: dict[str, list] = {k: [None] * n for k in keys}
        decoded = [0] * n
        for i, payload in enumerate(t["payload"].to_pylist()):
            if payload is None:
                continue
            try:
                vals = self._parse(payload)
            except (ValueError, IndexError):
                continue
            for k, v in zip(keys, vals):
                cols[k][i] = v
            decoded[i] = 1
        out = {self.id_col: t[self.id_col]}
        out.update({k: pa.array(v, pa.int64()) for k, v in cols.items()})
        out["decoded"] = pa.array(decoded, pa.int64())
        return pa.table(out)


def video_features(ds: ray.data.Dataset, id_col: str = "doc_id",
                   batch_size: int = 32,
                   concurrency=(1, 4)) -> ray.data.Dataset:
    """(id, payload) media table -> typed video features via the real
    Y4M parser.  Small batch_size: raw video frames dominate the
    worker-heap unit."""
    return ds.map_batches(
        Y4mFeatureExtractor,
        fn_constructor_kwargs={"id_col": id_col},
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def sample_frames(ds: ray.data.Dataset, every_k: int = 2,
                  id_col: str = "doc_id", batch_size: int = 32,
                  concurrency=(1, 4)) -> ray.data.Dataset:
    """(id, payload) media table -> every_k-th-frame Y4M sample (valid
    Y4M payloads out, feedable to video_features / hashing tiers)."""
    return ds.map_batches(
        Y4mFrameSampler,
        fn_constructor_kwargs={"every_k": every_k, "id_col": id_col},
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )


class VideoTemporalHasher:
    """Actor-pool stage computing a 64-bit TEMPORAL difference hash per
    Y4M video payload: per-frame luma-plane sum (the frame's brightness
    envelope) -> nearest-neighbor resample to 65 temporal buckets ->
    bit i = 1 iff bucket i+1 < bucket i.  Same public difference-hash
    construction as the image dHash / audio envelope hash, applied along
    TIME: the hash depends only on the ORDERING of adjacent resampled
    frame brightnesses, so any monotone per-pixel luma map (gain /
    offset / gamma re-encode) yields the IDENTICAL hash, and frame-rate
    changes (every-k-th-frame re-encodes, the Y4mFrameSampler output)
    sample the same brightness envelope at nearby positions — flipping
    only the few bits whose bucket boundaries moved, so rate-twins land
    within a small Hamming distance.

    Output columns: id_col, ``vhash`` (uint64), ``n_frames`` (int64),
    ``decoded`` (int64); malformed / truncated / null payloads route to
    decoded=0 (state='error' downstream), matching the modality's
    feature extractors."""

    def __init__(self, id_col: str = "doc_id") -> None:
        self.id_col = id_col

    def _vhash(self, payload: bytes) -> tuple[int, int]:
        (w, h, _fn, _fd, _cs, _off), spans = _y4m_frames(payload)
        ysz = w * h
        if not spans or ysz == 0:
            raise ValueError("no frames")
        means = np.empty(len(spans), dtype=np.int64)
        for j, (s, _) in enumerate(spans):
            means[j] = int(np.frombuffer(payload, dtype=np.uint8,
                                         count=ysz, offset=s)
                           .sum(dtype=np.int64))
        idx = (np.arange(_DH_W * _DH_H + 1, dtype=np.int64)
               * len(means)) // (_DH_W * _DH_H + 1)
        env = means[idx]
        bits = env[1:] < env[:-1]
        return (int.from_bytes(np.packbits(bits).tobytes(), "big"),
                len(spans))

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        hashes = [0] * n
        nframes = [0] * n
        decoded = [0] * n
        for i, payload in enumerate(t["payload"].to_pylist()):
            if payload is None:
                continue
            try:
                hashes[i], nframes[i] = self._vhash(payload)
            except (ValueError, IndexError, struct.error):
                continue
            decoded[i] = 1
        return pa.table({
            self.id_col: t[self.id_col],
            "vhash": pa.array(hashes, pa.uint64()),
            "n_frames": pa.array(nframes, pa.int64()),
            "decoded": pa.array(decoded, pa.int64()),
        })


def video_hash(ds: ray.data.Dataset, id_col: str = "doc_id",
               batch_size: int = 32,
               concurrency=(1, 4)) -> ray.data.Dataset:
    """(id, payload) -> (id, vhash, n_frames, decoded) via the temporal
    difference-hash actor pool.  Small batch_size: raw video frames
    dominate the worker-heap unit."""
    return ds.map_batches(
        VideoTemporalHasher,
        fn_constructor_kwargs={"id_col": id_col},
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def video_dedup(ds: ray.data.Dataset, hamming: int = 6,
                id_col: str = "doc_id",
                num_partitions: int = 32) -> ray.data.Dataset:
    """Perceptual near-duplicate VIDEO dedup: temporal brightness-
    envelope hashes -> Hamming-block clustering (the shared
    ``_phash_cluster`` core, VERDICT r3 #7) -> keep/delete/unique
    assignments — the video analogue of image_dedup / audio_dedup.
    Default ``hamming=6``: gain twins hash identically (ordering-only),
    frame-rate twins flip a handful of boundary bits."""
    return _phash_cluster(
        video_hash(ds, id_col=id_col).drop_columns(["n_frames"]),
        hamming, id_col, "vhash", num_partitions)
