"""CLI: ``python -m remotesensingproject_tpu.cli.main <command>``.

Subcommands mirror the reference's per-file test executables
(RSLightFields/tests/*.cpp; call stacks in SURVEY.md §3), headless:
windows become written PNGs.

  read-img        test_read_tiff       — read one image, print stats
  build-epi       test_build_row_epi*  — build + save one EPI
  gallery         test_skysat_rectified_gallery — dump scaled frames
  depth1d         test_depth_computation       — single-EPI depth
  pile            test_depth_computation_pile  — one s_hat, all v
  depth2d         test_depth_computation_2d    — full 2-D propagation
  fine-to-coarse  test_fine_to_coarse          — full pyramid pipeline
  bench           (new) performance benchmark
  info            (new) devices / versions
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _add_io_args(p):
    p.add_argument("folder", help="folder of frames")
    p.add_argument("--ext", default="tif")
    p.add_argument("--transpose", action="store_true")
    p.add_argument("--rotate180", action="store_true")
    p.add_argument("--out", default="output")


def _add_depth_args(p):
    p.add_argument("--dmin", type=float, default=-1.0)
    p.add_argument("--dmax", type=float, default=4.0)
    p.add_argument("--dim-d", type=int, default=120)
    p.add_argument("--s-hat", type=int, default=-1)
    p.add_argument("--scale-factor", type=float, default=-1.0)
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--sharded", action="store_true",
                   help="run v-sharded over all local devices")
    p.add_argument("--ckpt-dir", default=None,
                   help="checkpoint/resume directory (fine-to-coarse)")
    p.add_argument("--score", choices=["edge", "disp", "line"],
                   default="edge",
                   help="confidence criterion (the reference's "
                        "_USE_*_CONFIDENCE_SCORE ifdefs)")
    p.add_argument("--fast", action="store_true",
                   help="quality-gated fast mode: cap the Pallas "
                        "sweep's mean-shift iterations at 5 (not "
                        "bit-exact vs the reference)")


def _make_params(args):
    import dataclasses

    from ..config import DEFAULT_PARAMS
    p = DEFAULT_PARAMS
    if getattr(args, "score", "edge") != "edge":
        p = dataclasses.replace(p, score_version=args.score)
    if getattr(args, "fast", False):
        p = dataclasses.replace(p, fast=True)
    return p


def _read_volume(args):
    from ..utils import io

    t0 = time.time()
    imgs = io.read_imgs_from_folder(args.folder, args.ext,
                                    transpose=args.transpose,
                                    rotate_180=args.rotate180)
    print(f"read {imgs.shape[0]} frames {imgs.shape[1]}x{imgs.shape[2]} "
          f"in {time.time() - t0:.2f}s")
    return io.build_epis_from_imgs(imgs)


def cmd_read_img(args):
    from ..utils import io

    img = io.read_img_from_file(args.folder, args.name, args.ext)
    print(f"shape={img.shape} dtype={img.dtype} "
          f"min={img.min()} max={img.max()}")
    print(img[:3, :3])


def cmd_build_epi(args):
    from ..utils import io
    from ..utils.plot import draw_red_lines

    imgs = io.read_imgs_from_folder(args.folder, args.ext,
                                    transpose=args.transpose,
                                    rotate_180=args.rotate180)
    row = args.row if args.row >= 0 else imgs.shape[1] // 2
    epi = io.build_row_epi_from_imgs(imgs, row)
    io.write_img(draw_red_lines(imgs[0, ..., 0] if imgs.shape[-1] == 1
                                else imgs[0], fill_row_red=row),
                 args.out, "epi_1st")
    from ..utils.plot import copy_and_scale_uchar
    io.write_img(copy_and_scale_uchar(epi[..., 0] if epi.shape[-1] == 1
                                      else epi), args.out, "epi")
    print(f"EPI {epi.shape} written to {args.out}/")


def cmd_gallery(args):
    from ..utils import io
    from ..utils.plot import ImageConverterUint8

    imgs = io.read_imgs_from_folder(args.folder, args.ext)
    conv = ImageConverterUint8().fit(imgs[0], saturate=True)
    for s in range(imgs.shape[0]):
        a = conv.copy_and_scale(imgs[s])
        io.write_img(a[..., 0] if a.shape[-1] == 1 else a,
                     args.out, f"frame_{s:03d}")
    print(f"{imgs.shape[0]} frames written to {args.out}/")


def cmd_depth1d(args):
    from ..models.depth1d import Depth1DComputer
    from ..utils import io

    epis = _read_volume(args)
    v = args.row if args.row >= 0 else epis.shape[0] // 2
    t0 = time.time()
    computer = Depth1DComputer(epis[v], args.dmin, args.dmax, args.dim_d,
                               s_hat=args.s_hat,
                               epi_scale_factor=args.scale_factor)
    computer.run()
    print(f"depth1d in {time.time() - t0:.2f}s")
    io.write_img(computer.get_coloured_epi(), args.out, "coloured_epi")


def cmd_pile(args):
    from ..models.pile import Depth1DComputerPile
    from ..utils import io

    epis = _read_volume(args)
    t0 = time.time()
    computer = Depth1DComputerPile(
        epis, args.dmin, args.dmax, args.dim_d, s_hat=args.s_hat,
        epi_scale_factor=args.scale_factor,
        params=_make_params(args),
        use_pallas=None if not args.no_pallas else False)
    computer.run()
    print(f"pile in {time.time() - t0:.2f}s")
    io.write_img(computer.get_disparity_map(), args.out, "disparity_map")
    io.write_img(computer.get_coloured_epi(), args.out, "coloured_epi")


def cmd_depth2d(args):
    from ..models.depth2d import Depth2DComputer
    from ..utils import io
    from ..utils.plot import copy_and_scale_uchar, apply_colormap

    epis = _read_volume(args)
    t0 = time.time()
    computer = Depth2DComputer(
        epis, args.dmin, args.dmax, args.dim_d,
        epi_scale_factor=args.scale_factor, verbose=True,
        params=_make_params(args),
        use_pallas=None if not args.no_pallas else False)
    state = computer.run()
    print(f"depth2d in {time.time() - t0:.2f}s")
    depths = np.asarray(state.best_depth)
    masks = np.asarray(computer.get_valid_depths_mask_s_v_u())
    for s in range(depths.shape[0]):
        rgb = apply_colormap(copy_and_scale_uchar(depths[s]))
        rgb[~masks[s]] = 0
        io.write_img(rgb, args.out, f"disparity_{s:03d}")
    io.write_npz(args.out, "depth2d_results",
                 best_depth=depths, disp_confidence=state.disp_conf,
                 edge_confidence=state.ce, validity=masks)
    print(f"maps + npz written to {args.out}/")


def cmd_fine_to_coarse(args):
    from ..models.fine_to_coarse import FineToCoarse
    from ..utils import io

    epis = _read_volume(args)
    mesh = None
    if args.sharded:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh()
    t0 = time.time()
    ftc = FineToCoarse(
        epis, args.dmin, args.dmax, args.dim_d,
        epi_scale_factor=args.scale_factor, verbose=True,
        params=_make_params(args),
        use_pallas=None if not args.no_pallas else False, mesh=mesh)
    ftc.run(ckpt_dir=args.ckpt_dir)
    maps = ftc.get_coloured_depth_maps()
    fused, validity = ftc.get_results()
    print(f"fine-to-coarse in {time.time() - t0:.2f}s")
    for s in range(maps.shape[0]):
        io.write_img(maps[s], args.out, f"depth_map_{s:03d}")
    io.write_npz(args.out, "fine_to_coarse_results",
                 fused=np.asarray(fused), validity=np.asarray(validity))
    print(f"maps + npz written to {args.out}/")


def cmd_info(args):
    import jax

    import remotesensingproject_tpu as rs

    print(f"remotesensingproject_tpu {rs.__version__}")
    print(f"jax {jax.__version__} backend={jax.default_backend()}")
    print(f"devices: {jax.devices()}")


def cmd_bench(args):
    import bench

    bench.main()


def main(argv=None):
    ap = argparse.ArgumentParser(prog="remotesensingproject_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("read-img")
    p.add_argument("folder")
    p.add_argument("name")
    p.add_argument("--ext", default="tif")
    p.set_defaults(fn=cmd_read_img)

    p = sub.add_parser("build-epi")
    _add_io_args(p)
    p.add_argument("--row", type=int, default=-1)
    p.set_defaults(fn=cmd_build_epi)

    p = sub.add_parser("gallery")
    _add_io_args(p)
    p.set_defaults(fn=cmd_gallery)

    for name, fn in [("depth1d", cmd_depth1d), ("pile", cmd_pile),
                     ("depth2d", cmd_depth2d),
                     ("fine-to-coarse", cmd_fine_to_coarse)]:
        p = sub.add_parser(name)
        _add_io_args(p)
        _add_depth_args(p)
        if name == "depth1d":
            p.add_argument("--row", type=int, default=-1)
        p.set_defaults(fn=fn)

    p = sub.add_parser("info")
    p.set_defaults(fn=cmd_info)
    p = sub.add_parser("bench")
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    from ..utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
