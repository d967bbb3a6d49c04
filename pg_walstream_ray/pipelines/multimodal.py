"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
decoded/feature-extracted by actor-pool map_batches stages.

The real decoders (PIL/opencv/ffmpeg) are NOT in this container, so the
byte-level decode is a deterministic fake behind the same interface: every
payload carries a 16-byte header ``b'FAKE' + width:u32 + height:u32 +
channels:u32`` (little-endian) followed by ``width*height*channels`` payload
bytes derived from a seeded counter.  The Ray-side plumbing — binary Arrow
schema, small batch sizes for large payloads, actor __init__-once decoder
state, struct-typed metadata output — is real and tested; swapping in a
real codec is a one-function change (``_decode_header``).

Header fields are pure functions of doc_id, so the metadata extraction has
a DuckDB SQL oracle even though the bytes themselves never leave Ray.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAGIC = b"FAKE"
HEADER_FMT = "<4sIII"
HEADER_SIZE = struct.calcsize(HEADER_FMT)

# deterministic fake-image geometry (mirrored in the SQL oracle)
#   width  = 16 + doc_id % 48
#   height = 16 + (doc_id * 7) % 48
#   channels = 1 + doc_id % 3


def fake_geometry(doc_id: np.ndarray):
    w = 16 + doc_id % 48
    h = 16 + (doc_id * 7) % 48
    c = 1 + doc_id % 3
    return w, h, c


def synthesize_media(sf_dir: str):
    """documents -> (doc_id, media:binary, media_type) — the synthetic stand-
    in for an image column. Payload bytes are seeded per doc."""
    import ray.data as rd

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        w, h, c = fake_geometry(ids)
        blobs = []
        for i, doc_id in enumerate(ids):
            size = int(w[i] * h[i] * c[i])
            rng = np.random.default_rng(doc_id)
            payload = rng.integers(0, 256, size=size, dtype=np.uint8)
            blobs.append(struct.pack(HEADER_FMT, MAGIC, int(w[i]), int(h[i]), int(c[i]))
                         + payload.tobytes())
        return pa.table({"doc_id": t["doc_id"],
                         "media": pa.array(blobs, pa.binary()),
                         "media_type": pa.array(["image/fake"] * len(ids))})

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id"])
    # large binary payloads -> small batches (memory-aware)
    return ds.map_batches(synth, batch_format="pyarrow", batch_size=256)


class MediaDecodeStage:
    """Actor: decode header + compute cheap per-payload features.

    __init__ loads the "model"/codec once per actor.  With a real image lib
    this is where Image.open/cv2.imdecode would run; payload stats stand in
    for pixel features here.
    """

    def __init__(self, strict: bool = True):
        self.strict = strict
        try:                                  # real decoder, if ever present
            import PIL.Image  # noqa: F401
            self.real_codec = True
        except ImportError:
            self.real_codec = False

    def _decode_header(self, blob: bytes):
        magic, w, h, c = struct.unpack_from(HEADER_FMT, blob, 0)
        if magic != MAGIC:
            if self.strict:
                raise NotImplementedError(
                    "real image decode requires PIL/opencv (not in this "
                    "container); only FAKE payloads are decodable")
            return None
        return w, h, c

    def __call__(self, t: pa.Table) -> pa.Table:
        blobs = t["media"].to_pylist()
        ids = t["doc_id"].to_pylist()
        keep, ws, hs, cs, nbytes, checks = [], [], [], [], [], []
        for doc_id, blob in zip(ids, blobs):
            hdr = self._decode_header(blob)
            if hdr is None:                  # non-strict: skip undecodable
                continue
            w, h, c = hdr
            payload = np.frombuffer(blob, dtype=np.uint8,
                                    offset=HEADER_SIZE)
            keep.append(doc_id)
            ws.append(w); hs.append(h); cs.append(c)
            nbytes.append(len(payload))
            checks.append(int(payload.sum()) & 0xFFFFFFFF)
        return pa.table({
            "doc_id": pa.array(keep, pa.int64()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "channels": pa.array(cs, pa.int32()),
            "n_bytes": pa.array(nbytes, pa.int64()),
            "checksum": pa.array(checks, pa.int64()),
        })


def media_metadata(sf_dir: str, concurrency: int = 4):
    """Synthesize binary media then decode metadata via the actor pool.
    Output: (doc_id, width, height, channels, n_bytes, checksum).
    width/height/channels/n_bytes have a SQL oracle (pure doc_id functions);
    checksum is covered by unit tests (bytes never leave Ray)."""
    return synthesize_media(sf_dir).map_batches(
        MediaDecodeStage, batch_format="pyarrow", concurrency=(1, concurrency),
        batch_size=256)


class FrameSampleStage:
    """Actor: "video" frame sampling — slice the payload into ``n_frames``
    fixed-stride frames and emit one row per sampled frame (flat_map
    shape).  Demonstrates the 1->N multimodal explode with bounded batch
    memory."""

    def __init__(self, every: int = 4):
        self.every = every

    def __call__(self, t: pa.Table) -> pa.Table:
        out_doc, out_frame, out_mean = [], [], []
        for doc_id, blob in zip(t["doc_id"].to_pylist(),
                                t["media"].to_pylist()):
            _, w, h, c = struct.unpack_from(HEADER_FMT, blob, 0)
            frame_len = int(w) * int(c)          # one "row" of the image
            payload = np.frombuffer(blob, dtype=np.uint8, offset=HEADER_SIZE)
            n_frames = len(payload) // frame_len if frame_len else 0
            for f in range(0, n_frames, self.every):
                frame = payload[f * frame_len:(f + 1) * frame_len]
                out_doc.append(doc_id)
                out_frame.append(f)
                out_mean.append(float(np.round(frame.mean(), 4)))
        return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                         "frame_idx": pa.array(out_frame, pa.int32()),
                         "mean_intensity": pa.array(out_mean, pa.float64())})


def frame_samples(sf_dir: str, every: int = 4, concurrency: int = 4):
    """(doc_id, frame_idx, mean_intensity) — one row per sampled frame."""
    return synthesize_media(sf_dir).map_batches(
        FrameSampleStage, fn_constructor_kwargs={"every": every},
        batch_format="pyarrow", concurrency=(1, concurrency), batch_size=256)


class MediaResizeStage:
    """Actor: nearest-neighbor "resize" of the fake image payload to fit a
    target max dimension (aspect-preserving, integer math so the output
    geometry has an exact SQL oracle).  The pixel work is real vectorized
    numpy over a (h, w, c) view — with a real codec this is where
    PIL.Image.resize would run; the Ray plumbing (actor pool, small
    batches, binary in -> binary out) is the part that matters at scale.
    """

    def __init__(self, target: int = 32):
        self.target = target

    def __call__(self, t: pa.Table) -> pa.Table:
        out_id, out_w, out_h, out_blob = [], [], [], []
        for doc_id, blob in zip(t["doc_id"].to_pylist(),
                                t["media"].to_pylist()):
            _, w, h, c = struct.unpack_from(HEADER_FMT, blob, 0)
            m = max(w, h)
            nw = max(1, (w * self.target) // m)
            nh = max(1, (h * self.target) // m)
            img = np.frombuffer(blob, dtype=np.uint8,
                                offset=HEADER_SIZE).reshape(h, w, c)
            yi = (np.arange(nh) * h) // nh
            xi = (np.arange(nw) * w) // nw
            small = img[yi][:, xi]               # nearest-neighbor gather
            out_id.append(doc_id)
            out_w.append(nw)
            out_h.append(nh)
            out_blob.append(struct.pack(HEADER_FMT, MAGIC, nw, nh, c)
                            + small.tobytes())
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "out_w": pa.array(out_w, pa.int32()),
            "out_h": pa.array(out_h, pa.int32()),
            "media": pa.array(out_blob, pa.binary()),
        })


def media_resize(sf_dir: str, target: int = 32, concurrency: int = 4):
    """Resized media + geometry audit.
    Output: (doc_id, out_w, out_h, out_bytes) — all pure integer functions
    of doc_id (SQL-oracled); the resized payload itself stays in Ray."""

    def audit(t: pa.Table) -> pa.Table:
        sizes = pc.binary_length(t["media"])
        return pa.table({
            "doc_id": t["doc_id"],
            "out_w": t["out_w"],
            "out_h": t["out_h"],
            "out_bytes": pc.cast(pc.subtract(sizes, HEADER_SIZE), pa.int64()),
        })

    return synthesize_media(sf_dir).map_batches(
        MediaResizeStage, fn_constructor_kwargs={"target": target},
        batch_format="pyarrow", concurrency=(1, concurrency),
        batch_size=256).map_batches(audit, batch_format="pyarrow")


class MediaFeatureStage:
    """Actor: per-payload feature extraction — a 16-bin byte histogram
    (the stand-in for a vision-model embedding; batched model inference
    would live here, loaded once in __init__)."""

    N_BINS = 16

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, feats, argmax = [], [], []
        for doc_id, blob in zip(t["doc_id"].to_pylist(),
                                t["media"].to_pylist()):
            payload = np.frombuffer(blob, dtype=np.uint8,
                                    offset=HEADER_SIZE)
            hist = np.bincount(payload >> 4, minlength=self.N_BINS) \
                .astype(np.float64)
            hist /= max(1.0, hist.sum())
            ids.append(doc_id)
            feats.append(hist.tolist())
            argmax.append(int(hist.argmax()))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "feature": pa.array(feats, pa.list_(pa.float64())),
            "argmax_bin": pa.array(argmax, pa.int32()),
        })


def media_features(sf_dir: str, concurrency: int = 4):
    """(doc_id, feature list<float64>[16], argmax_bin) — deterministic
    per-payload features via the actor pool; no SQL oracle (the bytes
    never leave Ray), determinism + shape pinned in tests."""
    return synthesize_media(sf_dir).map_batches(
        MediaFeatureStage, batch_format="pyarrow",
        concurrency=(1, concurrency), batch_size=256)


# ---------------------------------------------------------------------------
# Audio modality: integer-deterministic PCM16 payloads + waveform stats
# ---------------------------------------------------------------------------

AUDIO_MAGIC = b"FAKA"
AUDIO_HEADER_FMT = "<4sII"                 # magic, n_samples, sample_rate
AUDIO_HEADER_SIZE = struct.calcsize(AUDIO_HEADER_FMT)
AUDIO_RATE = 16_000
# integer waveform generator, mirrored verbatim in the SQL oracle:
#   n_samples(doc) = 256 + (doc_id % 7) * 128
#   sample(doc, i) = ((doc_id * 2654435761 + i * 40503) % 65536) - 32768


def synthesize_audio(sf_dir: str):
    """documents -> (doc_id, audio:binary, media_type) — the audio twin
    of synthesize_media: PCM16-LE payloads behind an opaque binary
    column.  The waveform is an INTEGER recurrence of (doc_id, i), so
    the stats an actor computes from the BYTES have an exact SQL oracle
    even though the bytes never leave Ray — the audio analogue of the
    fake-image geometry contract."""
    import ray.data as rd

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        blobs = []
        for doc_id in ids:
            n = 256 + int(doc_id % 7) * 128
            i = np.arange(n, dtype=np.int64)
            x = ((int(doc_id) * 2654435761 + i * 40503) % 65536) - 32768
            blobs.append(struct.pack(AUDIO_HEADER_FMT, AUDIO_MAGIC, n,
                                     AUDIO_RATE)
                         + x.astype("<i2").tobytes())
        return pa.table({"doc_id": t["doc_id"],
                         "audio": pa.array(blobs, pa.binary()),
                         "media_type": pa.array(["audio/fake"] * len(ids))})

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id"])
    return ds.map_batches(synth, batch_format="pyarrow", batch_size=256)


class AudioStatsStage:
    """Actor: decode the PCM16 payload and compute waveform statistics —
    the feature-extraction seam a real audio pipeline (loudness, VAD,
    resampling) plugs into.  All-integer outputs: peak = max |x|,
    energy_q = sum(x^2) // n (mean-square, exact), zero_crossings =
    sign changes (negative -> non-negative or back)."""

    def __init__(self, strict: bool = True):
        self.strict = strict

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, n_out, peak, energy, zc = [], [], [], [], []
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        for k, blob in enumerate(t["audio"].to_pylist()):
            magic, n, rate = struct.unpack_from(AUDIO_HEADER_FMT, blob)
            if magic != AUDIO_MAGIC:
                if self.strict:
                    raise NotImplementedError(
                        "real audio codec not available in this "
                        "container; payload lacks the synthetic magic")
                continue
            x = np.frombuffer(blob, dtype="<i2",
                              offset=AUDIO_HEADER_SIZE,
                              count=n).astype(np.int64)
            ids.append(did[k])
            n_out.append(n)
            peak.append(int(np.abs(x).max()) if n else 0)
            energy.append(int((x * x).sum()) // max(n, 1))
            neg = x < 0
            zc.append(int((neg[1:] != neg[:-1]).sum()) if n > 1 else 0)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_samples": pa.array(n_out, pa.int64()),
            "peak": pa.array(peak, pa.int64()),
            "energy_q": pa.array(energy, pa.int64()),
            "zero_crossings": pa.array(zc, pa.int64())})


def audio_stats(sf_dir: str, concurrency: int = 4):
    """(doc_id, n_samples, peak, energy_q, zero_crossings) — synthetic
    PCM payloads decoded and reduced by the actor pool; the integer
    waveform generator gives the byte-level pipeline an exact SQL
    oracle (the image stages oracle only their header geometry)."""
    return synthesize_audio(sf_dir).map_batches(
        AudioStatsStage, batch_format="pyarrow",
        concurrency=(1, concurrency), batch_size=256)


AUDIO_FRAMES = 8


class AudioFrameEnergyStage:
    """Actor: frame-level loudness — the VAD / silence-trim primitive:
    split each waveform into AUDIO_FRAMES equal time windows (every
    n_samples is divisible by 8 under the generator) and emit the
    per-frame mean-square energy (integer floor)."""

    def __init__(self, strict: bool = True):
        self.strict = strict

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, energy = [], [], []
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        for k, blob in enumerate(t["audio"].to_pylist()):
            magic, n, _rate = struct.unpack_from(AUDIO_HEADER_FMT, blob)
            if magic != AUDIO_MAGIC:
                if self.strict:
                    raise NotImplementedError(
                        "real audio codec not available in this "
                        "container; payload lacks the synthetic magic")
                continue
            x = np.frombuffer(blob, dtype="<i2",
                              offset=AUDIO_HEADER_SIZE,
                              count=n).astype(np.int64)
            fl = n // AUDIO_FRAMES
            e = (x[:fl * AUDIO_FRAMES].reshape(AUDIO_FRAMES, fl) ** 2) \
                .sum(axis=1) // fl
            ids.append(np.full(AUDIO_FRAMES, did[k], np.int64))
            fidx.append(np.arange(AUDIO_FRAMES, dtype=np.int64))
            energy.append(e)
        if not ids:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "frame_idx": pa.array([], pa.int64()),
                             "energy_q": pa.array([], pa.int64())})
        return pa.table({
            "doc_id": pa.array(np.concatenate(ids)),
            "frame_idx": pa.array(np.concatenate(fidx)),
            "energy_q": pa.array(np.concatenate(energy))})


def audio_frame_energy(sf_dir: str, concurrency: int = 4):
    """(doc_id, frame_idx, energy_q) — per-time-window loudness from the
    PCM payloads, AUDIO_FRAMES windows per doc; integer-exact oracle
    via the waveform generator."""
    return synthesize_audio(sf_dir).map_batches(
        AudioFrameEnergyStage, batch_format="pyarrow",
        concurrency=(1, concurrency), batch_size=256)
