"""Host ingest throughput bench: clips/sec through decode -> mel -> transform.

The reference's data path (decord + ffmpeg subprocess + librosa per sample)
was its bottleneck (SURVEY §7). This measures our native-pipeline equivalent:
libav C++ decode (GIL-free) + numpy mel + numpy transforms under the threaded
prefetch loader.

Usage: python tools/bench_loader.py [num_clips] [workers] [batch]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_clips: int = 32, workers: int = 8, batch: int = 8):
    from avjepa_tpu.data.av_dataset import AVFileDataset
    from avjepa_tpu.data.loader import JepaLoader, ShardedSampler
    from avjepa_tpu.data.video_decoder import write_test_video
    from avjepa_tpu.layout import DEFAULT_AV_LAYOUT
    from avjepa_tpu.masks import AVMaskCollator

    tmp = tempfile.mkdtemp(prefix="loaderbench_")
    paths = []
    for i in range(n_clips):
        p = os.path.join(tmp, f"c{i}.avi")
        # ~10s 320x240 clips (Kinetics-ish decode load)
        write_test_video(p, n_frames=250, w=320, h=240, fps=25.0, with_audio=True)
        paths.append(p)
    csv = os.path.join(tmp, "index.csv")
    with open(csv, "w") as f:
        f.write("".join(f"{p} 0\n" for p in paths))

    ds = AVFileDataset(
        csv_paths=[csv], layout=DEFAULT_AV_LAYOUT,
        frames_per_clip=16, frame_step=4, crop_size=224,
    )
    coll = AVMaskCollator(
        [{"aspect_ratio": [0.75, 1.5], "num_blocks": 8,
          "spatial_scale": [0.15, 0.15], "temporal_scale": [1.0, 1.0]},
         {"aspect_ratio": [0.75, 1.5], "num_blocks": 2,
          "spatial_scale": [0.7, 0.7], "temporal_scale": [1.0, 1.0]}],
        DEFAULT_AV_LAYOUT,
    )
    sampler = ShardedSampler(len(ds), batch, num_shards=1, shard_index=0)
    loader = JepaLoader(ds, sampler, mask_collator=coll, num_workers=workers, use_processes=True)

    # warmup one batch (worker-pool spin-up), then CLOSE the iterator so its
    # producer thread stops pre-decoding into the timed window below
    warm = iter(loader)
    next(warm)
    warm.close()

    t0 = time.perf_counter()
    clips = 0
    for video, audio, _, masks in loader:
        clips += video.shape[0]
    dt = time.perf_counter() - t0
    result = {
        "metric": f"host ingest clips/sec (decode+mel+aug, {workers} workers)",
        "value": round(clips / dt, 2),
        "unit": "clips/sec",
        "clips": clips,
        "seconds": round(dt, 2),
    }
    print(json.dumps(result))
    for p in paths + [csv]:
        os.unlink(p)
    os.rmdir(tmp)
    return result


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    main(n, w, b)
