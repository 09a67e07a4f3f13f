"""By-construction golden features for the multimodal decode gate.

Same pattern as ``sources/pages.golden_parquet``: expectations computed from
the generator's OWN arrays (``rawmedia.image_array``/``audio_samples``/
``video_frames``) — never through the byte-level codecs under test — and
persisted where DuckDB can read them. A hash-green ``media_features`` gate
therefore certifies the full encode→decode roundtrip for all three real
container formats (BMP/WAV/Y4M) plus the deterministic feature math.

Rows are pre-exploded to (media_id, kind, n_bytes, pos, feat_e4) so the twin
is a plain SELECT (no engine-specific unnest-with-ordinality gymnastics).
"""

from __future__ import annotations

import math
import os

from ocr_machine_spark.core import rawmedia as RM


def media_golden_parquet(n: int, base_dir: str = "/tmp/ocr_machine_spark_goldens") -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(base_dir, f"media_goldens_v1_n{n}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(base_dir, exist_ok=True)

    ids, kinds, nbytes, poss, vals = [], [], [], [], []
    for i in range(n):
        kind = RM.kind_of(i)
        payload_len = len(RM.make_payload(i))
        if kind == "image":
            feats = RM.image_features(RM.image_array(i))
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
