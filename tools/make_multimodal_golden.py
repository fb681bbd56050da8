"""Regenerate the multimodal golden feature fixtures.

The synthetic media generators (stages/multimodal.py: synthesize_bmp_media /
synthesize_media / synthesize_video_media / synthesize_wav_media) and the
feature kernels (image_features / audio_features / the seeded stub path) are
fully deterministic, so the feature outputs of the three multimodal queries
are exactly reproducible.  This script materializes them (FULL feature
columns, not the id-only projection the driver gate sees) into
tests/fixtures/golden_{media,video_frame,audio_clip}_features.parquet;
tests/test_multimodal_golden.py asserts value equality against them.

Run only when the multimodal kernels intentionally change:

    python tools/make_multimodal_golden.py
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures"
)


def build_tables() -> dict[str, pa.Table]:
    """Compute the three golden tables (driver-side, via Ray Data, exactly the
    queries() construction but keeping every feature column)."""
    import ray
    import ray.data

    from hypertrace_ingester_ray.stages import multimodal

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)

    real = multimodal.synthesize_bmp_media(100, seed=7)
    stub = multimodal.synthesize_media(100, seed=7)
    stub = stub.set_column(
        0, "media_id", pa.array(np.arange(100, 200, dtype=np.int64))
    )
    media = ray.data.from_arrow(
        pa.concat_tables([real, stub], promote_options="default")
    )
    media_feats = (
        multimodal.extract_media_features(media, batch_size=64, concurrency=2)
        .sort("media_id")
        .to_arrow_refs()
    )
    media_tbl = pa.concat_tables([ray.get(r) for r in media_feats])

    clips = multimodal.synthesize_video_media(40, frames=12)
    video_tbl = pa.concat_tables(
        [
            ray.get(r)
            for r in multimodal.sample_video_frames(
                ray.data.from_arrow(clips), stride=4, max_frames=8, batch_size=8
            )
            .sort(["media_id", "frame_idx"])
            .to_arrow_refs()
        ]
    )

    wavs = multimodal.synthesize_wav_media(60)
    audio_tbl = pa.concat_tables(
        [
            ray.get(r)
            for r in multimodal.extract_audio_features(
                ray.data.from_arrow(wavs), batch_size=16
            )
            .sort("media_id")
            .to_arrow_refs()
        ]
    )

    return {
        "golden_media_features": media_tbl,
        "golden_video_frame_features": video_tbl,
        "golden_audio_clip_features": audio_tbl,
    }


def main() -> None:
    for name, tbl in build_tables().items():
        path = os.path.join(FIXTURES, f"{name}.parquet")
        pq.write_table(tbl, path)
        print(f"wrote {path}: {tbl.num_rows} rows, schema={tbl.schema.names}")


if __name__ == "__main__":
    main()
