"""Command-line interface.

Counterpart of the reference's clap CLI (cem-app/src/main.rs:62-78,
args.rs:3-12): ``run`` executes a scene (a Python file defining
``build_scene() -> Scene`` or the built-in example) headlessly, streaming
observer projections to PNG/GIF; ``dump-default-config`` prints the default
config in TOML or JSON; ``info`` shows device/build info (the debug-window
analog, cem-app/src/debug.rs); ``bench`` runs the throughput benchmark.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
import time
from pathlib import Path

__all__ = ["main"]


def _load_scene(path: str):
    if not Path(path).exists():
        raise SystemExit(f"scene file not found: {path}")
    spec = importlib.util.spec_from_file_location("user_scene", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if not hasattr(mod, "build_scene"):
        raise SystemExit(f"{path} must define build_scene() -> Scene")
    return mod.build_scene(), getattr(mod, "CONSTANTS", None)


def cmd_run(args) -> int:
    import fdtd_tpu as ft
    from fdtd_tpu.config import SolverConfig, read_config_or_create
    from fdtd_tpu.runner import ObserverBinding, SolverRunner, StopCondition
    from fdtd_tpu.scene import Volume, compile_scene
    from fdtd_tpu.solver.cpml import Cpml
    from fdtd_tpu.viz.targets import GifTarget, PngTarget

    app_cfg = read_config_or_create(Path(args.config) if args.config else None) \
        if not args.ignore_config else __import__(
            "fdtd_tpu.config", fromlist=["AppConfig"]).AppConfig()

    if args.scene and not args.scene.endswith(".py"):
        from fdtd_tpu.io import load_scene_file

        scene, constants = load_scene_file(args.scene), None
    elif args.scene:
        scene, constants = _load_scene(args.scene)
    else:
        from fdtd_tpu.models.example import EXAMPLE_CONSTANTS, example_scene

        scene, constants = example_scene(), EXAMPLE_CONSTANTS
    constants = constants or ft.SI

    cfg = SolverConfig(
        dx=args.dx,
        step_limit=args.steps,
        unit_system="reduced" if constants is ft.REDUCED else "si",
        cpml_cells=args.cpml,
        volume_margin=args.margin,
    )
    res = cfg.resolution(constants)
    cpml = Cpml.uniform(cfg.cpml_cells) if cfg.cpml_cells else None
    compiled = compile_scene(
        scene,
        res,
        constants=constants,
        volume=Volume.scene_aabb(margin=cfg.volume_margin),
        cpml=cpml,
        memory_limit_bytes=(
            int(cfg.memory_limit_mb * 1e6) if cfg.memory_limit_mb else None
        ),
    )
    sim = compiled.simulation
    print(
        f"lattice {compiled.grid.shape} ({compiled.grid.num_cells:,} cells), "
        f"dt={compiled.grid.dt:.4g}, materials={compiled.num_materials}, "
        f"sources={compiled.sources.num_sources}, "
        f"memory~{sim.memory_required()/1e6:.1f} MB",
        file=sys.stderr,
    )

    out = Path(args.out)
    observers = []
    closers = []
    for i, ro in enumerate(compiled.observers):
        gif_path = ro.entity.observer.write_to_gif  # per-observer override
        if gif_path or args.gif:
            target = GifTarget(
                str(out / (gif_path or f"observer{i}.gif")), fps=25
            )
            closers.append(target)
        else:
            target = PngTarget(str(out / f"observer{i}_{{tick}}.png"))
        observers.append(
            ObserverBinding.slice_view(
                ro.axis, ro.index, compiled.grid.shape, target,
                field=ro.entity.observer.field, size=tuple(app_cfg.image_size),
            )
        )

    fb = None
    if getattr(args, "watch", False):
        # live view: mirror the first observer (or a default mid-x
        # slice) into a FrameBuffer the terminal viewer polls
        from fdtd_tpu.viz.targets import FrameBuffer

        fb = FrameBuffer()
        if compiled.observers:
            ro = compiled.observers[0]
            w_axis, w_index, w_field = (
                ro.axis, ro.index, ro.entity.observer.field
            )
        else:
            w_axis, w_index, w_field = 0, compiled.grid.shape[0] // 2, "e"
        observers.append(
            ObserverBinding.slice_view(
                w_axis, w_index, compiled.grid.shape, fb, field=w_field,
                size=tuple(app_cfg.image_size),
            )
        )

    runner = SolverRunner(
        sim,
        stop_condition=StopCondition(step_limit=cfg.step_limit),
        observers=observers,
        ticks_per_dispatch=args.ticks_per_dispatch or app_cfg.ticks_per_dispatch,
    )
    if args.resume:
        from fdtd_tpu.io import load_checkpoint

        runner._sim_state, meta = load_checkpoint(args.resume, template=sim.init())
        print(f"resumed from {args.resume} at tick "
              f"{int(runner._sim_state.tick)}", file=sys.stderr)
        runner.state.paused = False
        runner._thread = __import__("threading").Thread(
            target=runner._loop, name="solver", daemon=True)
        runner._thread.start()
    else:
        runner.start(paused=False)
    t0 = time.perf_counter()
    try:
        if fb is not None:
            # live terminal view at the observation cadence, mirroring
            # the reference's solver window (solver/ui.rs:31-126)
            from fdtd_tpu.scene.composer import ComposerSession
            from fdtd_tpu.viz.watch import LiveView

            out.mkdir(parents=True, exist_ok=True)
            # interactive scene-view loop (arrows orbit, +/- zoom, TAB
            # cycles selection, [ / ] UPS throttle — view.rs:88-227 +
            # solver/ui.rs:80-126 headlessly)
            session = ComposerSession(scene)
            session.fit_camera()
            view = LiveView(runner, fb, png_path=str(out / "live.png"),
                            session=session)
            view.watch()
            runner.join()
        else:
            while True:
                runner.join(timeout=1.0)
                st = runner.stats()
                print(
                    f"\rtick {st.sim_tick}  sim t={st.sim_time:.4g}  "
                    f"step {st.last_step_time*1e3:.2f} ms",
                    end="",
                    file=sys.stderr,
                )
                if st.finished:
                    break
    except KeyboardInterrupt:
        runner.stop()
        runner.join()
    print(file=sys.stderr)
    for c in closers:
        c.close()
    if runner.error is not None:
        raise runner.error
    if args.save_checkpoint:
        from fdtd_tpu.io import save_checkpoint

        save_checkpoint(args.save_checkpoint, runner.sim_state,
                        metadata={"shape": list(compiled.grid.shape)})
        print(f"checkpoint written to {args.save_checkpoint}", file=sys.stderr)
    st = runner.stats()
    wall = time.perf_counter() - t0
    rate = st.sim_tick * compiled.grid.num_cells / max(st.total_running_time, 1e-9)
    print(
        f"done: {st.sim_tick} ticks in {wall:.2f} s "
        f"({rate/1e6:.1f} Mcell-updates/s), outputs in {out}/",
        file=sys.stderr,
    )
    return 0


def cmd_dump_default_config(args) -> int:
    from fdtd_tpu.config import AppConfig

    cfg = AppConfig()
    print(cfg.to_json() if args.format == "json" else cfg.to_toml(), end="")
    return 0


def cmd_info(args) -> int:
    import jax

    import fdtd_tpu

    info = {
        "fdtd_tpu": fdtd_tpu.__version__,
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
    }
    print(json.dumps(info, indent=2))
    return 0


def cmd_nec_info(args) -> int:
    """Print a parsed NEC deck (counterpart of the nec-file crate's
    read_file example, nec-file/examples/read_file.rs:11-20)."""
    from fdtd_tpu.io import parse_nec
    from fdtd_tpu.io.nec import Wire, WireArc

    nec = parse_nec(Path(args.file).read_text())
    for c in nec.comments:
        print(f"comment: {c}")
    for tag, g in nec.geometry:
        if isinstance(g.spec, Wire):
            e1, e2 = g.spec.world_ends(g.transform)
            print(
                f"wire tag={tag} segments={g.spec.num_segments} "
                f"from=({e1[0]:g},{e1[1]:g},{e1[2]:g}) "
                f"to=({e2[0]:g},{e2[1]:g},{e2[2]:g})"
            )
        elif isinstance(g.spec, WireArc):
            print(f"arc tag={tag} segments={g.spec.num_segments} "
                  f"radius={g.spec.arc_radius:g}")
        else:
            print(f"patch tag={tag} kind={g.spec.kind}")
    print(f"ground plane: {nec.ground_plane}; symmetry: {nec.symmetry}")
    if nec.ignored_decks:
        print(f"ignored program-control cards: {len(nec.ignored_decks)}")
    return 0


def cmd_preview(args) -> int:
    """Render a 3D scene preview PNG (matplotlib, or ray-traced PBR)."""
    from fdtd_tpu.io import load_scene_file
    from fdtd_tpu.viz import render_scene_preview

    if args.scene:
        scene = load_scene_file(args.scene)
    else:
        from fdtd_tpu.models.example import example_scene

        scene = example_scene()
    if args.pbr:
        from fdtd_tpu.viz import Camera, render_pbr_png

        cam = Camera(aspect=args.width / args.height)
        cam = cam.fit_to_scene_looking_along_axis(
            scene, (-1.0, -0.6, -0.8), margin=(0.2, 0.2)
        )
        out = render_pbr_png(
            scene, cam, args.out, width=args.width, height=args.height,
            background=(1.0, 1.0, 1.0, 1.0),
        )
    else:
        out = render_scene_preview(
            scene, args.out, title=args.scene or "example scene"
        )
    print(out)
    return 0


def cmd_bench(args) -> int:
    import runpy

    bench = Path(__file__).resolve().parent.parent / "bench.py"
    runpy.run_path(str(bench), run_name="__main__")
    return 0


def main(argv=None) -> int:
    from .utils.observability import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(prog="fdtd-tpu", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    run = sub.add_parser("run", help="run a scene headlessly")
    run.add_argument("scene", nargs="?", help="Python file with build_scene()")
    run.add_argument("--steps", type=int, default=500)
    run.add_argument("--dx", type=float, default=0.1)
    run.add_argument("--cpml", type=int, default=0, help="CPML cells per edge")
    run.add_argument("--margin", type=float, default=1.0)
    run.add_argument("--out", default="out")
    run.add_argument("--gif", action="store_true", help="GIF instead of PNGs")
    run.add_argument("--config", help="config file path")
    run.add_argument("--ignore-config", action="store_true")
    run.add_argument("--ticks-per-dispatch", type=int, default=None)
    run.add_argument("--save-checkpoint", metavar="PATH",
                     help="write the final state to PATH (.npz)")
    run.add_argument("--resume", metavar="PATH",
                     help="resume from a checkpoint written by --save-checkpoint")
    run.add_argument("--watch", action="store_true",
                     help="live terminal view of the first observer "
                          "(SPACE pauses, q stops) + out/live.png")
    run.set_defaults(fn=cmd_run)

    dump = sub.add_parser("dump-default-config")
    dump.add_argument("--format", choices=("toml", "json"), default="toml")
    dump.set_defaults(fn=cmd_dump_default_config)

    info = sub.add_parser("info", help="device/build info")
    info.set_defaults(fn=cmd_info)

    bench = sub.add_parser("bench", help="throughput benchmark")
    bench.set_defaults(fn=cmd_bench)

    nec = sub.add_parser("nec-info", help="print a parsed NEC deck")
    nec.add_argument("file")
    nec.set_defaults(fn=cmd_nec_info)

    pv = sub.add_parser("preview", help="render a 3D scene preview PNG")
    pv.add_argument("scene", nargs="?", help=".json/.fdtd/.nec scene file")
    pv.add_argument("--out", default="scene_preview.png")
    pv.add_argument("--pbr", action="store_true",
                    help="ray-traced PBR render instead of matplotlib")
    pv.add_argument("--width", type=int, default=640)
    pv.add_argument("--height", type=int, default=480)
    pv.set_defaults(fn=cmd_preview)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
