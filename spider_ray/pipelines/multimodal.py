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
