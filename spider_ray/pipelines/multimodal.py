"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by actor-pool map_batches stages.

The image/audio codec libraries are NOT in this container, so the codec
itself is stubbed two ways (per the build brief):
  * decode_image_real(): raises NotImplementedError — the marked seam
    where Pillow/libvips/ffmpeg plug in;
  * FakeCodec: a deterministic stand-in that parses our synthetic binary
    format, so the Ray-side plumbing (binary Arrow columns, byte-aware
    batch sizing, actor signatures, output schema) is fully real and
    tested.

Synthetic payload format (deterministic from the documents table):
  b"IMG1" | uint16 h | uint16 w | h*w bytes derived from splitmix64.

Scale notes: binary payloads make rows wide — stages here use small
batch_size and pyarrow binary arrays end-to-end (never pandas object
dtype); at 100 TB the decode pool's concurrency × batch_size × payload
must fit worker heaps (the knobs are exposed as arguments).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.bloom import _splitmix64

MAGIC = b"IMG1"


def decode_image_real(payload: bytes):
    """The real-codec seam.  Plug Pillow/ffmpeg here when available."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use FakeCodec for the plumbing path")


def synth_payload(doc_id: int, n_chars: int) -> bytes:
    """Deterministic fake image: dimensions from the doc stats, pixels
    from a splitmix64 stream."""
    h = 8 + (doc_id % 8)
    w = 8 + (n_chars % 16)
    n = h * w
    words = _splitmix64(np.arange((n + 7) // 8, dtype=np.uint64)
                        + np.uint64(doc_id * 2_654_435_761 + 17))
    pix = words.view(np.uint8)[:n]
    return MAGIC + int(h).to_bytes(2, "little") + int(w).to_bytes(2, "little") + pix.tobytes()


def make_binary_table(sf_dir: str):
    """documents -> (doc_id, payload:binary, media_type, h, w): the
    synthetic multimodal input table."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        ncs = np.asarray(t["n_chars"], dtype=np.int64)
        payloads = [synth_payload(int(i), int(n)) for i, n in zip(ids, ncs)]
        return pa.table({
            "doc_id": t["doc_id"],
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image/fake"] * len(ids), pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


class FakeCodec:
    """Actor-pool decode + feature-extract stage.  __init__ = the
    once-per-actor setup slot (real codecs initialize here); __call__
    decodes each payload and emits fixed-size features."""

    def __init__(self, resize_to: int = 4):
        self.resize_to = resize_to

    def decode(self, payload: bytes) -> np.ndarray:
        assert payload[:4] == MAGIC, "bad magic"
        h = int.from_bytes(payload[4:6], "little")
        w = int.from_bytes(payload[6:8], "little")
        pix = np.frombuffer(payload[8:8 + h * w], dtype=np.uint8).reshape(h, w)
        return pix

    def resize(self, img: np.ndarray) -> np.ndarray:
        """Deterministic box-ish downsample to (resize_to, resize_to)."""
        r = self.resize_to
        hs = np.linspace(0, img.shape[0], r + 1).astype(int)
        ws = np.linspace(0, img.shape[1], r + 1).astype(int)
        out = np.zeros((r, r), dtype=np.float64)
        for i in range(r):
            for j in range(r):
                out[i, j] = img[hs[i]:hs[i + 1], ws[j]:ws[j + 1]].mean()
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        feats, hh, ww = [], [], []
        for payload in t["payload"].to_pylist():
            img = self.decode(payload)
            hh.append(img.shape[0])
            ww.append(img.shape[1])
            feats.append(np.round(self.resize(img).ravel(), 4))
        return pa.table({
            "doc_id": t["doc_id"],
            "height": pa.array(hh, pa.int32()),
            "width": pa.array(ww, pa.int32()),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float64())),
        })


def multimodal_features(sf_dir: str):
    """Synthesize binary payloads -> actor-pool decode/resize/feature
    stage.  Small batch_size on purpose: payload bytes x batch x
    concurrency is the memory envelope for wide binary rows."""
    return make_binary_table(sf_dir).map_batches(
        FakeCodec, fn_constructor_args=(4,), batch_format="pyarrow",
        batch_size=256, concurrency=2, num_cpus=1)


def multimodal_feature_stats(sf_dir: str):
    """Aggregate over decoded features: mean feature magnitude per
    height bucket (exercises list-column -> numeric reduction)."""
    from ray.data.aggregate import Count, Mean

    feats = multimodal_features(sf_dir)

    def agg_prep(t: pa.Table) -> pa.Table:
        f = t["features"]
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        arr = np.asarray(f.flatten()).reshape(t.num_rows, -1)
        return pa.table({"height": t["height"],
                         "mean_feature": pa.array(arr.mean(axis=1))})

    out = (feats.map_batches(agg_prep, batch_format="pyarrow")
           .groupby("height")
           .aggregate(Count(alias_name="n"),
                      Mean("mean_feature", alias_name="avg_feature")))

    def rnd(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = t.schema.get_field_index("avg_feature")
        return t.set_column(i, "avg_feature", pc.round(t["avg_feature"], ndigits=3))
    return out.map_batches(rnd, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Video-style payloads: fixed-rate frame sampling (the standard first
# stage of any video training pipeline) as an actor-pool flat-map
# ---------------------------------------------------------------------------

VMAGIC = b"VID1"


def synth_video_payload(doc_id: int, n_chars: int) -> bytes:
    """Deterministic fake video: frame count / dimensions from the doc
    stats, per-frame pixels from one splitmix64 stream."""
    nf = 4 + (doc_id % 13)
    h = 4 + (doc_id % 4)
    w = 4 + (n_chars % 8)
    n = nf * h * w
    words = _splitmix64(np.arange((n + 7) // 8, dtype=np.uint64)
                        + np.uint64(doc_id * 11_400_714_819 + 29))
    pix = words.view(np.uint8)[:n]
    return (VMAGIC + int(nf).to_bytes(2, "little")
            + int(h).to_bytes(2, "little") + int(w).to_bytes(2, "little")
            + pix.tobytes())


def make_video_table(sf_dir: str):
    """documents -> (doc_id, payload:binary, media_type): the synthetic
    video input table (frame count rides inside the container, as in a
    real mp4)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        ncs = np.asarray(t["n_chars"], dtype=np.int64)
        payloads = [synth_video_payload(int(i), int(n))
                    for i, n in zip(ids, ncs)]
        return pa.table({
            "doc_id": t["doc_id"],
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["video/fake"] * len(ids), pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


class FrameSampler:
    """Actor-pool frame-sampling stage: decode the container ONCE per
    payload, keep every `stride`-th frame (fixed-rate sampling — the
    ffmpeg `-vf fps=` analogue), emit one row per KEPT frame with
    integer per-frame features (pixel sum + count: exact, so tests
    recompute them bit-for-bit).  1 video -> ceil(n_frames/stride)
    rows: a flat-map, which is why it returns a longer table than its
    input.  __init__ is the once-per-actor codec slot; the real ffmpeg
    decoder plugs into decode_video_real below."""

    def __init__(self, stride: int = 3):
        self.stride = stride

    def decode(self, payload: bytes) -> np.ndarray:
        assert payload[:4] == VMAGIC, "not a VID1 payload"
        nf = int.from_bytes(payload[4:6], "little")
        h = int.from_bytes(payload[6:8], "little")
        w = int.from_bytes(payload[8:10], "little")
        pix = np.frombuffer(payload, np.uint8, count=nf * h * w, offset=10)
        return pix.reshape(nf, h, w)

    def __call__(self, t: pa.Table) -> pa.Table:
        out_id, out_fi, out_sum, out_n = [], [], [], []
        for doc_id, payload in zip(t["doc_id"].to_pylist(),
                                   t["payload"].to_pylist()):
            frames = self.decode(payload)
            kept = frames[::self.stride]
            idxs = np.arange(0, frames.shape[0], self.stride)
            sums = kept.reshape(len(kept), -1).sum(axis=1, dtype=np.int64)
            out_id += [doc_id] * len(kept)
            out_fi += idxs.tolist()
            out_sum += sums.tolist()
            out_n += [frames.shape[1] * frames.shape[2]] * len(kept)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_fi, pa.int64()),
            "pix_sum": pa.array(out_sum, pa.int64()),
            "n_pix": pa.array(out_n, pa.int64()),
        })


def decode_video_real(payload: bytes):
    """The real-codec seam.  Plug ffmpeg/pyav here when available."""
    raise NotImplementedError(
        "video codecs are not available in this environment; "
        "FrameSampler.decode parses the synthetic container instead")


def multimodal_frame_features(sf_dir: str, stride: int = 3):
    """Video payloads -> actor-pool frame sampling.  batch_size stays
    small (payloads are the widest rows in the suite: up to ~1.3 KB
    each here, MBs in production — bytes x batch x concurrency is the
    worker heap envelope)."""
    return make_video_table(sf_dir).map_batches(
        FrameSampler, fn_constructor_args=(stride,),
        batch_format="pyarrow", batch_size=256, concurrency=2, num_cpus=1)


def multimodal_frame_stats(sf_dir: str, stride: int = 3):
    """Per-video reduce over the sampled frames: frames kept + mean
    pixel value (integer sums, one final rounded division)."""
    from ray.data.aggregate import Count, Sum

    frames = multimodal_frame_features(sf_dir, stride=stride)
    out = (frames.groupby("doc_id")
           .aggregate(Count(alias_name="frames_sampled"),
                      Sum("pix_sum", alias_name="pix_sum"),
                      Sum("n_pix", alias_name="n_pix")))

    def finish(t: pa.Table) -> pa.Table:
        ps = np.asarray(t["pix_sum"], dtype=np.int64)
        npx = np.asarray(t["n_pix"], dtype=np.int64)
        mean = np.floor(ps * 1e4 / np.maximum(npx, 1) + 0.5) / 1e4
        return pa.table({
            "doc_id": t["doc_id"],
            "frames_sampled": pa.array(
                np.asarray(t["frames_sampled"], dtype=np.int64), pa.int64()),
            "mean_pixel": pa.array(mean, pa.float64()),
        })

    return out.map_batches(finish, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# Audio-style payloads: frame-energy / silence analysis (the standard
# first pass of any speech-data pipeline) as an actor-pool stage
# ---------------------------------------------------------------------------

AMAGIC = b"AUD1"
_SR = 16_000
_FRAME = 160  # 10 ms at 16 kHz — the conventional VAD hop


def synth_audio_payload(doc_id: int, n_chars: int) -> bytes:
    """Deterministic fake audio: little-endian int16 PCM in a tiny
    container (magic + sample-rate + count), sample count from the doc
    stats, samples from one splitmix64 stream — with every 4th 10 ms
    frame attenuated >>6 so silence detection has real work to do."""
    n = 640 + (n_chars % 7) * _FRAME + (doc_id % 3) * 40  # not frame-aligned
    words = _splitmix64(np.arange((n + 3) // 4, dtype=np.uint64)
                        + np.uint64(doc_id * 2_654_435_761 + 97))
    samples = words.view(np.int16)[:n].copy()
    frame_of = np.arange(n) // _FRAME
    quiet = (frame_of + doc_id) % 4 == 0
    samples[quiet] >>= 6
    return (AMAGIC + int(_SR).to_bytes(4, "little")
            + int(n).to_bytes(4, "little") + samples.tobytes())


def make_audio_table(sf_dir: str):
    """documents -> (doc_id, payload:binary, media_type): the synthetic
    audio input table."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        ncs = np.asarray(t["n_chars"], dtype=np.int64)
        payloads = [synth_audio_payload(int(i), int(n))
                    for i, n in zip(ids, ncs)]
        return pa.table({
            "doc_id": t["doc_id"],
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["audio/fake"] * len(ids), pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


class AudioFeaturizer:
    """Actor-pool audio analysis stage: decode the container ONCE per
    payload, frame into 10 ms hops, and emit integer-exact per-doc
    features (tests recompute them bit-for-bit): total samples, frame
    count, mean frame energy (floor-divided int), silent-frame fraction
    (energy below `silence_thresh`), peak amplitude.  __init__ is the
    once-per-actor codec/config slot; a real soundfile/ffmpeg decoder
    plugs into decode_audio_real below."""

    def __init__(self, frame: int = _FRAME,
                 silence_thresh: int = 2_000_000_000):
        self.frame = frame
        self.silence_thresh = silence_thresh

    def decode(self, payload: bytes) -> np.ndarray:
        assert payload[:4] == AMAGIC, "not an AUD1 payload"
        n = int.from_bytes(payload[8:12], "little")
        return np.frombuffer(payload, np.int16, count=n, offset=12)

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("doc_id", "n_samples", "n_frames",
                                "mean_energy", "silence_frac", "peak_amp")}
        for doc_id, payload in zip(t["doc_id"].to_pylist(),
                                   t["payload"].to_pylist()):
            x = self.decode(payload).astype(np.int64)
            nf = len(x) // self.frame
            frames = x[:nf * self.frame].reshape(nf, self.frame)
            energy = (frames * frames).sum(axis=1)  # ≤ 160·(2¹⁵)² ≪ int64
            silent = int((energy < self.silence_thresh).sum())
            rows["doc_id"].append(doc_id)
            rows["n_samples"].append(len(x))
            rows["n_frames"].append(nf)
            rows["mean_energy"].append(
                int(energy.sum() // nf) if nf else 0)
            rows["silence_frac"].append(
                np.floor(silent / nf * 1e4 + 0.5) / 1e4 if nf else 0.0)
            rows["peak_amp"].append(int(np.abs(x).max()) if len(x) else 0)
        return pa.table({
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "n_samples": pa.array(rows["n_samples"], pa.int64()),
            "n_frames": pa.array(rows["n_frames"], pa.int64()),
            "mean_energy": pa.array(rows["mean_energy"], pa.int64()),
            "silence_frac": pa.array(rows["silence_frac"], pa.float64()),
            "peak_amp": pa.array(rows["peak_amp"], pa.int64()),
        })


def decode_audio_real(payload: bytes):
    """The real-codec seam.  Plug soundfile/ffmpeg here when available."""
    raise NotImplementedError(
        "audio codecs are not available in this environment; "
        "AudioFeaturizer.decode parses the synthetic container instead")


def multimodal_audio_stats(sf_dir: str):
    """Audio payloads -> actor-pool frame-energy features, sorted by
    doc_id.  Same byte-aware batch sizing as the image/video stages
    (payload bytes × batch × concurrency is the worker heap envelope)."""
    return (make_audio_table(sf_dir).map_batches(
        AudioFeaturizer, batch_format="pyarrow", batch_size=256,
        concurrency=2, num_cpus=1)
        .sort("doc_id"))
