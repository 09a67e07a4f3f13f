"""By-construction golden features for the multimodal decode gate.

Same pattern as ``sources/pages.golden_parquet``: expectations computed from
the generator's OWN arrays (``rawmedia.image_array``/``audio_samples``/
``video_frames``) — never through the byte-level codecs under test — and
persisted where DuckDB can read them. A hash-green ``media_features`` gate
therefore certifies the full encode→decode roundtrip for all five real
container formats (BMP/PNG/JPEG/WAV/Y4M — PNG across gray/truecolor ×
8/16-bit and all five scanline filters; JPEG across grayscale and
3-component baseline streams, exact on the flat-block content family) plus
the deterministic feature math.

Rows are pre-exploded to (media_id, kind, n_bytes, pos, feat_e4) so the twin
is a plain SELECT (no engine-specific unnest-with-ordinality gymnastics).
"""

from __future__ import annotations

import hashlib
import inspect
import math
import os

from ocr_machine_spark.core import rawmedia as RM

# Cache tag derived from the SOURCE of the feature/generator spec: any edit
# to rawmedia.py (codec, feature math, asset factory) changes the tag and
# invalidates every cached golden automatically — a stale v-tag can no
# longer gate against outdated expectations (ADVICE r4 #5).
_SPEC_TAG = hashlib.md5(inspect.getsource(RM).encode()).hexdigest()[:10]


def media_golden_parquet(n: int, base_dir: str = "/tmp/ocr_machine_spark_goldens") -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(base_dir, f"media_goldens_{_SPEC_TAG}_n{n}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(base_dir, exist_ok=True)

    ids, kinds, nbytes, poss, vals = [], [], [], [], []
    for i in range(n):
        kind = RM.kind_of(i)
        payload_len = len(RM.make_payload(i))
        if kind == "image":
            # native (container-specific) array → canonical rgb8 view — the
            # same feature space the decode path uses, built WITHOUT codecs
            feats = RM.image_features(RM.to_rgb8(RM.image_native(i)))
        elif kind == "audio":
            feats = RM.audio_features(RM.audio_samples(i), RM.AUDIO_RATE)
        else:
            feats = RM.video_features(RM.video_frames(i), RM.VIDEO_FPS)
        for p, f in enumerate(feats):
            ids.append(i)
            kinds.append(kind)
            nbytes.append(payload_len)
            poss.append(p)
            # identical IEEE sequence to functions.fixed_point on the Spark side
            vals.append(int(math.floor(f * 10000.0 + 0.5)))
    tbl = pa.Table.from_pydict(
        {"media_id": ids, "kind": kinds, "n_bytes": nbytes, "pos": poss, "feat_e4": vals},
        schema=pa.schema(
            [
                ("media_id", pa.int64()),
                ("kind", pa.string()),
                ("n_bytes", pa.int64()),
                ("pos", pa.int64()),
                ("feat_e4", pa.int64()),
            ]
        ),
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def media_frame_golden_parquet(
    n: int, every_n: int = 24, base_dir: str = "/tmp/ocr_machine_spark_goldens"
) -> str:
    """By-construction goldens for the real Y4M frame decode: every
    ``every_n``-th frame's exact-integer luma mean (e4) per video asset,
    computed from the generator's arrays — never through the codec."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(base_dir, f"media_frame_goldens_{_SPEC_TAG}_n{n}_e{every_n}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(base_dir, exist_ok=True)

    ids, idxs, means = [], [], []
    for i in range(n):
        if RM.kind_of(i) != "video":
            continue
        frames = RM.video_frames(i)
        nf, h, w = frames.shape
        for fi in range(0, nf, every_n):
            ids.append(i)
            idxs.append(fi)
            means.append(int(frames[fi].astype("int64").sum()) * 10000 // (h * w))
    tbl = pa.Table.from_pydict(
        {"media_id": ids, "frame_idx": idxs, "luma_mean_e4": means},
        schema=pa.schema(
            [("media_id", pa.int64()), ("frame_idx", pa.int64()), ("luma_mean_e4", pa.int64())]
        ),
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path
