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


def _enable_compile_cache():
    """Persistent XLA compilation cache: a production run's warm start is
    dominated by (re)compiles; the cache turns them into disk loads."""
    import os

    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # XLA:CPU AOT cache entries are not portable across machine types
        return
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("ORBSLAM2_TPU_COMPILE_CACHE",
                           "/root/.orbslam2_tpu_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    _enable_compile_cache()
    flags = parse_flags(argv)
    required = ("cid", "name", "width", "height", "bpp")
    if "kittiPath" not in flags and not all(k in flags for k in required):
        print(USAGE, file=sys.stderr)
        return 1

    config = config_from_flags(flags)
    raw_config = config   # pre-rectification dims for the SHM layout

    # Live stereo ingest may need resize + undistort-rectify before the
    # SLAM core (setUpRealtime, reference: src/selflocalization.cpp:380-531:
    # stereoRectify + initUndistortRectifyMap once, then per-frame remap at
    # :267-299; the rectified P1 intrinsics replace the raw ones :497-501).
    rect_maps = None
    if (not config.rectify) and 0 < config.resize < 1 and not config.kitti_path:
        # resize-only ingest: scale intrinsics + frame dims like the
        # reference's resizeScale pre-multiplication (reference:
        # src/selflocalization.cpp:438-472)
        import dataclasses

        sc = config.resize
        cam = config.camera
        config = dataclasses.replace(
            config,
            camera=dataclasses.replace(
                cam, fx=cam.fx * sc, fy=cam.fy * sc, cx=cam.cx * sc,
                cy=cam.cy * sc, bf=cam.bf * sc,
                width=int((config.width // 2) * sc),
                height=int(config.height * sc),
            ),
        )
    if config.rectify and not config.kitti_path:
        import dataclasses

        import jax.numpy as jnp

        from .ops import undistort as und

        scale = config.resize if config.resize > 0 else 1.0
        camL, camR = config.camera, config.camera_right
        h = int(config.height * scale)
        w = int((config.width // 2) * scale)
        R = und.rodrigues(jnp.asarray(
            [camL.rx, camL.cv_rot, camL.rz], jnp.float32))
        T = jnp.asarray([-camL.baseline, 0.0, 0.0], jnp.float32)
        sl = lambda v: v * scale
        R1, R2, (fxn, fyn, cxn, cyn), baseline = und.stereo_rectify(
            R, T, sl(camL.fx), sl(camL.fy), sl(camL.cx), sl(camL.cy),
            sl(camR.fx), sl(camR.fy), sl(camR.cx), sl(camR.cy),
        )
        grid_l = und.build_rectify_map(
            h, w, sl(camL.fx), sl(camL.fy), sl(camL.cx), sl(camL.cy),
            camL.k1, camL.k2, camL.p1, camL.p2, camL.k3,
            R1, fxn, fyn, cxn, cyn,
        )
        grid_r = und.build_rectify_map(
            h, w, sl(camR.fx), sl(camR.fy), sl(camR.cx), sl(camR.cy),
            camR.k1, camR.k2, camR.p1, camR.p2, camR.k3,
            R2, fxn, fyn, cxn, cyn,
        )
        rect_maps = (grid_l, grid_r)
        config = dataclasses.replace(
            config,
            camera=dataclasses.replace(
                camL, fx=float(fxn), fy=float(fyn), cx=float(cxn),
                cy=float(cyn), k1=0.0, k2=0.0, k3=0.0, p1=0.0, p2=0.0,
                bf=float(fxn * baseline), width=w, height=h,
            ),
        )

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
            config.kitti_path, pipeline, real_time=False, publisher=od4
        )
        runner.run()
        stats = runner.shutdown_stats()
        print(
            f"median tracking time: {stats['median_s']*1e3:.1f} ms, "
            f"mean: {stats['mean_s']*1e3:.1f} ms ({stats['fps']:.1f} fps)"
        )
        pipeline.shutdown(config.kitti_path)
        return 0

    # live mode: shared-memory ingest (reference: :78-118); the side-by-side
    # frame splits at the RAW width even when rectification rescaled the
    # SLAM-facing config (nextContainer, reference:
    # src/selflocalization.cpp:267-299)
    from .io.shared_memory import shared_memory_frames

    raw_w = int(flags.get("width", config.width))
    for img, ts in shared_memory_frames(raw_config):
        left = img[:, : raw_w // 2]
        right = img[:, raw_w // 2 :]
        if rect_maps is not None:
            from .ops.undistort import remap_bilinear

            left = remap_bilinear(left, rect_maps[0])
            right = remap_bilinear(right, rect_maps[1])
        if rect_maps is None and 0 < config.resize < 1:
            from .ops.resample import resize_bilinear

            left = resize_bilinear(left, (config.camera.height,
                                          config.camera.width))
            right = resize_bilinear(right, (config.camera.height,
                                            config.camera.width))
        pipeline.track(left, right, ts)
    pipeline.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
