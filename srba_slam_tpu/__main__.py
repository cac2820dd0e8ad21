"""CLI app shell (≙ src/srba-stereo-slam_main.cpp).

Usage::

    python -m srba_slam_tpu <config.ini> [--synthetic N] [--checkpoint path]
                            [--resume path]

Takes the reference's ``.ini`` config format unmodified (the demo configs
load as-is). ``--synthetic N`` replaces the image source with an N-frame
rendered sequence for dataset-free runs.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="srba_slam_tpu")
    ap.add_argument("config", help=".ini configuration (reference format)")
    ap.add_argument("--synthetic", type=int, default=0, metavar="N",
                    help="use an N-frame synthetic rendered sequence")
    ap.add_argument("--checkpoint", default="", help="save state here at the end")
    ap.add_argument("--resume", default="", help="restore state before running")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--batch", type=int, default=0, metavar="B",
                    help="frames per device dispatch (0 = auto: 8 on TPU, "
                         "per-frame on CPU)")
    ap.add_argument("--gt", "--eval", dest="gt", default="", metavar="FILE",
                    help="ground-truth trajectory (KITTI poses.txt, "
                         "out_kf_poses.txt format, or Nx3 xyz) to report "
                         "ATE RMSE against after the run; to evaluate an "
                         "EXISTING trajectory without re-running, use "
                         "python -m srba_slam_tpu.utils.evaluation")
    ap.add_argument("--fleet", type=int, default=0, metavar="S",
                    help="with --synthetic: run S independent sequences in "
                         "lockstep, sharded over the device mesh "
                         "(parallel.fleet); per-sequence outputs land in "
                         "<out_dir>/seq<i>/")
    ap.add_argument("--serve", type=int, nargs="?", const=0, default=None,
                    metavar="PORT",
                    help="serve a LIVE interactive map viewer over HTTP "
                         "(stdlib server rooted at <out_dir>; PORT omitted "
                         "= ephemeral). Browser equivalent of the "
                         "reference's live 3D window; implies show3D-style "
                         "per-keyframe snapshots")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from srba_slam_tpu.models.estimator import SRBAStereoSLAMEstimator
    from srba_slam_tpu.utils.framesource import ImageDirSource, SyntheticSource

    est = SRBAStereoSLAMEstimator.from_config(args.config)
    est.initialize()
    print(f"[srba_slam_tpu] backend: {jax.devices()[0].platform}", flush=True)

    if args.serve is not None:
        from srba_slam_tpu.utils.live_server import start_live_server

        # live snapshots ride the show3D hook (per-keyframe live_map.png/json)
        est.general.show3D = True
        _srv, port = start_live_server(est.general.out_dir or "out",
                                       args.serve)
        print(f"[srba_slam_tpu] live map viewer: http://localhost:{port}/",
              flush=True)
    if est.general.verbose_level >= 1:
        from srba_slam_tpu.config import dump_options

        print(dump_options(est.general, est.opts, est.vo_opts))
        if (est.general.pause_after_show_op
                or est.opts.pause_after_show_op) and sys.stdin is not None \
                and sys.stdin.isatty():
            # ≙ pause_after_show_op -> system::pause() after the option
            # dumps (reference utils.h:213, :482)
            input("Press <enter> to continue...")

    # config-driven state restore (≙ load_state_from_file/state_file,
    # reference utils.h:103-104,157-165 — the mutual exclusion with
    # save_state_to_file is applied at config load); the CLI --resume flag
    # takes precedence
    resume_path = args.resume or (
        est.general.state_file
        if est.general.load_state_from_file and est.general.state_file
        else "")
    if resume_path:
        from srba_slam_tpu.utils.checkpoint import load_state

        load_state(est, resume_path)
        print(f"[srba_slam_tpu] resumed from {resume_path} "
              f"({est.store.n_kfs} KFs)")

    if args.fleet:
        # multi-sequence lockstep evaluation over the device mesh — the
        # TPU-native scale-out axis the single-threaded reference lacks
        # (SURVEY §2.3); each sequence is a full independent SLAM run
        if not args.synthetic:
            print("[srba_slam_tpu] error: --fleet requires --synthetic N "
                  "(multi-directory image fleets are not wired to the CLI)",
                  file=sys.stderr)
            return 2
        import os

        from srba_slam_tpu.parallel.fleet import FleetSLAM

        ests = [est] + [
            SRBAStereoSLAMEstimator.from_config(args.config)
            for _ in range(args.fleet - 1)
        ]
        voc = est.bow.voc if est.bow is not None else None
        if voc is None:
            # no vocabulary file in the config: train ONE shared vocabulary
            # from the first voc_train_frames frames of sequence 0 (the
            # fleet's batched BoW/DA program bakes a single leaf table for
            # all sequences)
            scratch = SRBAStereoSLAMEstimator.from_config(args.config)
            scratch.initialize()
            n_train = max(1, scratch.opts.voc_train_frames)
            for l0, r0 in SyntheticSource(
                    scratch.cam, n_frames=n_train, step=0.5, seed=11):
                scratch.step(l0, r0)
            scratch.ensure_vocabulary()
            voc = scratch.bow.voc
            est.initialize(vocabulary=voc)
        for e in ests[1:]:
            e.initialize(vocabulary=voc)
        sources = [
            SyntheticSource(e.cam, n_frames=args.synthetic, step=0.5,
                            seed=11 + 37 * i)
            for i, e in enumerate(ests)
        ]
        fleet = FleetSLAM(ests)
        t0 = time.time()
        fleet.run(sources)
        dt = time.time() - t0
        n_frames = sum(e.frame_idx + 1 for e in ests)
        print(f"[srba_slam_tpu] fleet: {len(ests)} sequences x "
              f"{args.synthetic} frames on a {len(fleet.mesh.devices.ravel())}"
              f"-device mesh, {n_frames / max(dt, 1e-9):.2f} frames/s "
              "aggregate")
        out_dir = est.general.out_dir or "out"
        for i, e in enumerate(ests):
            e.finalize(out_dir=os.path.join(out_dir, f"seq{i}"))
            print(f"[srba_slam_tpu]   seq{i}: {e.store.n_kfs} keyframes -> "
                  f"{out_dir}/seq{i}/")
        return 0

    if args.synthetic:
        source = SyntheticSource(est.cam, n_frames=args.synthetic, step=0.5)
    elif est.general.cap_src == "rawlog" or (
            est.general.rawlog_file and est.general.cap_src != "image_dir"):
        # ≙ the reference's CCameraSensor rawlog grabber
        # (src/CSRBAStereoSLAMEstimator.cpp:1194-1197, srba-stereo-slam_utils.h:96-101).
        # The MRPT binary rawlog format is not supported in this build —
        # reject loudly instead of silently ignoring the config key.
        print(
            "[srba_slam_tpu] error: grabber_type=rawlog is not supported "
            f"(rawlog_file={est.general.rawlog_file!r}); export the rawlog "
            "to an image directory (e.g. mrpt's rawlog-edit "
            "--externalize/--extract-images) and use grabber_type=image_dir",
            file=sys.stderr,
        )
        return 2
    else:
        try:
            from srba_slam_tpu.native.loader import NativeImageDirSource

            if NativeImageDirSource.available():
                g = est.general
                source = NativeImageDirSource(
                    g.image_dir_url, g.left_format, g.right_format,
                    g.start_index, g.end_index,
                )
            else:
                raise RuntimeError
        except Exception:
            source = ImageDirSource.from_options(est.general)

    if est.general.save_state_to_file and est.general.save_at_iteration > 0:
        # ≙ save_at_iteration (reference utils.h:94, .cpp:223-235: "save
        # state and exit" at iteration N — designed-but-disabled there,
        # working here): truncate the run at that frame; the end-of-run
        # save below persists the state
        import itertools

        source = itertools.islice(
            iter(source), est.general.save_at_iteration)
        print(f"[srba_slam_tpu] will stop and save state at iteration "
              f"{est.general.save_at_iteration}")

    batch = args.batch
    if batch == 0:
        batch = 8 if jax.devices()[0].platform != "cpu" else 1
    if est.general.pause_at_each_iteration:
        # interactive per-frame pausing is incompatible with batched
        # dispatch (≙ reference .cpp:934-935, a per-iteration pause)
        batch = 1
    t0 = time.time()
    if batch > 1:
        log = est.perform_stereo_slam_batched(source, batch=batch)
    else:
        log = est.perform_stereo_slam(source)
    dt = time.time() - t0
    n = len(log)
    print(f"[srba_slam_tpu] {n} frames, {est.store.n_kfs} keyframes, "
          f"{n / max(dt, 1e-9):.2f} fps")

    out_dir = est.general.out_dir or "out"
    poses = est.finalize(out_dir=out_dir)
    print(f"[srba_slam_tpu] outputs written to {out_dir}/")

    if args.gt:
        import numpy as np

        from srba_slam_tpu.utils.evaluation import ate_rmse, load_gt

        gt_xyz, per_frame = load_gt(args.gt)
        if per_frame:
            # associate each KEYFRAME with the ground-truth row of the frame
            # it was inserted at
            kf_frames = [r.frame_idx for r in log if r.inserted_kf is not None]
            kf_frames = [f for f in kf_frames if f < len(gt_xyz)]
            est_xyz = poses[: len(kf_frames), 3:]
            gt_sel = gt_xyz[kf_frames]
        else:
            n = min(len(gt_xyz), len(poses))
            est_xyz, gt_sel = poses[:n, 3:], gt_xyz[:n]
        if len(est_xyz) >= 3:
            rmse = ate_rmse(est_xyz, gt_sel)
            print(f"[srba_slam_tpu] ATE RMSE vs {args.gt}: {rmse:.4f} m "
                  f"({len(est_xyz)} keyframes, SE(3)-aligned)")
        else:
            print("[srba_slam_tpu] --gt: fewer than 3 associated poses; "
                  "no ATE computed")
    if est.general.enable_logger:
        print(est.profiler.summary())

    # config-driven state save (≙ save_state_to_file/state_file,
    # reference utils.h:103-104,157-165); --checkpoint takes precedence
    save_path = args.checkpoint or (
        est.general.state_file
        if est.general.save_state_to_file and est.general.state_file
        else "")
    if save_path:
        from srba_slam_tpu.utils.checkpoint import save_state

        save_state(est, save_path)
        print(f"[srba_slam_tpu] state saved to {save_path}")
    return 0


if __name__ == "__main__":
    # top-level catch ≙ the reference's main() try/except
    # (src/srba-stereo-slam_main.cpp:66-75); mid-run pipeline failures have
    # already saved their artifacts via the estimator's emergency epilogue
    try:
        sys.exit(main())
    except FileNotFoundError as e:
        print(f"[srba_slam_tpu] error: {e}", file=sys.stderr)
        sys.exit(1)
    except KeyboardInterrupt:
        print("[srba_slam_tpu] interrupted", file=sys.stderr)
        sys.exit(130)
    except Exception as e:  # noqa: BLE001
        import traceback

        traceback.print_exc()
        print(f"[srba_slam_tpu] fatal: {type(e).__name__}: {e} "
              "(crash artifacts, if any, are under <out_dir>/crash/)",
              file=sys.stderr)
        sys.exit(1)
