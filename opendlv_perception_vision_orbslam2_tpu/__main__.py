"""CLI entry point: flag-compatible with the reference microservice.

Parity with main() (reference: src/opendlv-perception-vision-orbslam2.cpp:32-129):
required flags ``--name --cid --width --height --bpp``; ``--kittiPath``
selects dataset mode; otherwise frames come from the shared-memory ingest
loop fed by a camera proxy.  All ``--Camera.*`` / ``--ORBextractor.*`` /
``--BoundingBox.*`` flags accept the reference's exact syntax (see
utils/config.py), so the docker-compose command line ports unchanged.
"""

from __future__ import annotations

import sys

from .utils.config import config_from_flags, parse_flags

USAGE = """\
opendlv-perception-vision-orbslam2-tpu: TPU-native stereo/mono SLAM.
Required: --cid=<conference> --name=<shm name> --width=<px> --height=<px> --bpp=<bits>
Dataset mode: --kittiPath=<dir with times.txt + image_0/ + image_1/>
Optional: --cameraType=stereo|mono|rgbd --vocFilePath=<ORBvoc.txt>
          --Camera.fx/.fy/.cx/.cy/.fps/.bf  --ThDepth  --ORBextractor.*
          --refLatitude/--refLongitude/--startHeading  --verbose
"""


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    flags = parse_flags(argv)
    required = ("cid", "name", "width", "height", "bpp")
    if "kittiPath" not in flags and not all(k in flags for k in required):
        print(USAGE, file=sys.stderr)
        return 1

    config = config_from_flags(flags)
    vocab = None
    if config.voc_file_path:
        from .models.vocabulary import load_text_vocabulary

        vocab = load_text_vocabulary(config.voc_file_path)

    from .io.od4 import NullSession, OD4Session
    from .models.selflocalization import Selflocalization

    od4 = NullSession()
    if "cid" in flags:
        try:
            od4 = OD4Session(config.cid, sender_stamp=config.id)
        except OSError as exc:
            print(f"OD4 unavailable ({exc}); publishing disabled", file=sys.stderr)

    pipeline = Selflocalization(config, od4=od4, vocab=vocab)

    if config.kitti_path:
        from .io.kitti import KittiRunner

        runner = KittiRunner(
            config.kitti_path, pipeline.slam, real_time=False, publisher=od4
        )
        runner.run()
        stats = runner.shutdown_stats()
        print(
            f"median tracking time: {stats['median_s']*1e3:.1f} ms, "
            f"mean: {stats['mean_s']*1e3:.1f} ms ({stats['fps']:.1f} fps)"
        )
        pipeline.shutdown(config.kitti_path)
        return 0

    # live mode: shared-memory ingest (reference: :78-118)
    from .io.shared_memory import shared_memory_frames

    for img, ts in shared_memory_frames(config):
        pipeline.track(
            img[:, : config.width // 2], img[:, config.width // 2 :], ts
        )
    pipeline.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
