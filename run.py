"""pgdvs_tpu CLI — evaluate / visualize novel-view synthesis.

Counterpart of the reference launcher (``/root/reference/pgdvs/run.py``),
minus torch.multiprocessing/NCCL: multi-chip scaling is a jax mesh inside
one process (``pgdvs_tpu.parallel``); multi-host runs use
``jax.distributed.initialize`` + ``--process-index/--process-count`` item
striding (the reference's DistributedSampler semantics).

Examples:
  python run.py eval --dataset nvidia_eval --data-root /data \
      --scene-ids Balloon1 --out-dir experiments/balloon1
  python run.py vis --dataset nvidia_vis --data-root /data \
      --scene-ids Balloon1 --out-dir experiments/balloon1_vis
  python run.py bench
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")

LOGGER = logging.getLogger("pgdvs_tpu")


def _configure_jax():
    """Apply platform/cache config. NOTE: this environment force-registers
    its TPU plugin regardless of JAX_PLATFORMS, so explicit selection goes
    through jax.config (PGDVS_PLATFORM=cpu|tpu|axon)."""
    import jax

    plat = os.environ.get("PGDVS_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/tmp/pgdvs_tpu_jax_cache")


def build_render_config(args, base: dict = None):
    """CLI --render-cfg overrides composed onto ``base`` (a restored run's
    saved config) or the defaults.

    Mirrors the reference's experiment-resume recompose: it reloads the old
    run's ``overrides.yaml`` and appends the NEW CLI overrides on top
    (``/root/reference/pgdvs/run.py:206-261``) — here the saved resolved
    config is the base and new ``--render-cfg`` flags win.

    Composition order: base -> perf preset (--perf-preset fast, the default
    for eval/vis: the benchmarked kernel configuration) -> explicit
    --render-cfg overrides (always win, so ``--render-cfg
    epipolar_mode=exact`` opts any single knob back out of the preset).
    """
    from pgdvs_tpu.renderers.config import RenderConfig, apply_perf_preset

    fields = {f.name for f in dataclasses.fields(RenderConfig)}
    base_cfg = RenderConfig(
        **{k: v for k, v in (base or {}).items() if k in fields}
    )
    if getattr(args, "perf_preset", "exact") == "fast":
        base_cfg = apply_perf_preset(base_cfg)
    overrides = {}
    for kv in args.render_cfg or []:
        k, _, v = kv.partition("=")
        if k not in fields:
            raise SystemExit(f"unknown render_cfg field {k!r}; known: {sorted(fields)}")
        cur = getattr(RenderConfig(), k)
        if isinstance(cur, bool):
            overrides[k] = v.lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            overrides[k] = int(v)
        elif isinstance(cur, float):
            overrides[k] = float(v)
        else:
            overrides[k] = v
    return base_cfg.replace(**overrides)


def _coerce(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    return v


def build_dataset(args):
    from pgdvs_tpu.data.combined import CombinedDataset

    kwargs = {"data_root": args.data_root}
    if args.scene_ids:
        kwargs["scene_ids"] = args.scene_ids
    for kv in args.dataset_arg or []:
        k, _, v = kv.partition("=")
        kwargs[k] = _coerce(v)
    return CombinedDataset([(args.dataset, kwargs)])


def build_models_and_params(args, cfg):
    import jax

    from pgdvs_tpu.models.gnt.weight_port import load_gnt_checkpoint
    from pgdvs_tpu.renderers.static_gnt import init_gnt_params, make_gnt_models

    models = make_gnt_models(dtype=args.gnt_dtype)
    params = load_gnt_checkpoint(args.gnt_ckpt)
    if params is None:
        LOGGER.warning(
            "no GNT checkpoint found (set --gnt-ckpt or PGDVS_CKPT_DIR); "
            "using random weights — renders will be structurally valid but "
            "not photometric"
        )
        params = init_gnt_params(jax.random.PRNGKey(0), *models, n_src=2)
    return models, params


def build_eval_mesh(args):
    """Mesh over the local devices for in-engine eval DP (N views on N
    chips — the reference's one-process-per-GPU parallelism, in-process).
    Returns None for a single device (plain jit)."""
    import jax

    n = args.devices if args.devices > 0 else jax.local_device_count()
    if n <= 1:
        return None
    from pgdvs_tpu.parallel.mesh import make_mesh

    return make_mesh(n_devices=n, rp=getattr(args, "rp", 1) or 1)


def cmd_eval(args):
    from pgdvs_tpu.engines.evaluator import Evaluator
    from pgdvs_tpu.metrics.lpips_jax import load_torch_weights

    cfg = build_render_config(args)
    dataset = build_dataset(args)
    models, params = build_models_and_params(args, cfg)
    lpips_params = load_torch_weights()
    if lpips_params is None:
        LOGGER.warning("LPIPS weights unavailable; reporting PSNR/SSIM only")
    ev = Evaluator(
        models,
        params,
        cfg,
        static_mode=args.static_mode,
        out_dir=args.out_dir,
        lpips_params=lpips_params,
        save_vis=args.save_vis,
        mesh=build_eval_mesh(args),
    )
    result = ev.run(
        dataset,
        process_index=args.process_index,
        process_count=args.process_count,
        max_items=args.max_items,
    )
    print(json.dumps(result, indent=2))
    if args.out_dir:
        with open(pathlib.Path(args.out_dir) / "summary.json", "w") as f:
            json.dump(result, f, indent=2)


def cmd_vis(args):
    from pgdvs_tpu.engines.visualizer import Visualizer

    cfg = build_render_config(args)
    dataset = build_dataset(args)
    models, params = build_models_and_params(args, cfg)
    out = Visualizer(
        models, params, cfg, args.out_dir, static_mode=args.static_mode
    ).run(dataset)
    print(f"wrote {out}")


def cmd_train(args):
    """Per-scene GNT fine-tuning (the capability the reference scaffolds but
    leaves unimplemented — ``trainer_pgdvs.py:246-247``)."""
    from pgdvs_tpu.engines.trainer import Trainer
    from pgdvs_tpu.parallel.mesh import make_mesh

    if args.resume and not args.out_dir:
        raise SystemExit("--resume needs --out-dir (the checkpoint directory)")
    saved = None
    if args.resume:
        from pgdvs_tpu.engines.checkpoint import load_run_config

        saved = load_run_config(args.out_dir)
    # resume recompose: restored config is the base, NEW CLI overrides win
    cfg = build_render_config(args, base=(saved or {}).get("render_cfg"))
    if args.out_dir:
        from pgdvs_tpu.engines.checkpoint import save_run_config

        save_run_config(
            args.out_dir, {"render_cfg": dataclasses.asdict(cfg)}
        )
    dataset = build_dataset(args)
    models, params = build_models_and_params(args, cfg)
    trainer = Trainer(
        models,
        params,
        cfg,
        lr=args.lr,
        n_rays_per_view=args.n_rays,
        mesh=make_mesh(rp=args.rp),
        ckpt_dir=args.out_dir,
        n_ckpts_keep=args.n_ckpts_keep,
        train_on=args.train_on,
    )
    if args.resume:
        trainer.resume()
    loss = float("nan")
    for _ in range(args.epochs):
        loss = trainer.train_epoch(dataset, seed=args.seed)
        LOGGER.info("epoch %d mean loss %.5f", trainer.epoch, loss)
    print(json.dumps({"epochs": trainer.epoch, "steps": trainer.step,
                      "final_epoch_loss": loss}))


def cmd_bench(args):
    import runpy

    runpy.run_path(str(pathlib.Path(__file__).parent / "bench.py"), run_name="__main__")


def cmd_benchmark(args):
    """Run a named benchmark_type bundle (the reference's ablation matrix)."""
    from pgdvs_tpu.configs.benchmarks import make_tracker, resolve_benchmark

    cfg, spec = resolve_benchmark(args.benchmark_type, preset=args.perf_preset)
    # fold in explicit --render-cfg overrides
    if args.render_cfg:
        fields = {}
        for kv in args.render_cfg:
            k, _, v = kv.partition("=")
            cur = getattr(cfg, k)
            if isinstance(cur, bool):
                fields[k] = v.lower() in ("1", "true", "yes")
            elif isinstance(cur, int):
                fields[k] = int(v)
            elif isinstance(cur, float):
                fields[k] = float(v)
            else:
                fields[k] = v
        cfg = cfg.replace(**fields)

    dataset_name = spec.get("dataset", "nvidia_eval")
    if args.dataset_family == "dycheck_iphone":
        dataset_name = "dycheck_iphone_eval"
    dataset_kwargs = {"data_root": args.data_root, **spec.get("dataset_args", {})}
    if args.scene_ids:
        dataset_kwargs["scene_ids"] = args.scene_ids
    from pgdvs_tpu.data.combined import CombinedDataset

    dataset = CombinedDataset([(dataset_name, dataset_kwargs)])
    models, params = build_models_and_params(args, cfg)
    tracker = make_tracker(spec.get("tracker"))

    if spec.get("engine") == "vis":
        from pgdvs_tpu.engines.visualizer import Visualizer

        out = Visualizer(
            models, params, cfg, args.out_dir, static_mode=spec["static_mode"]
        ).run(dataset)
        print(f"wrote {out}")
        return

    from pgdvs_tpu.engines.evaluator import Evaluator
    from pgdvs_tpu.metrics.lpips_jax import load_torch_weights

    ev = Evaluator(
        models,
        params,
        cfg,
        static_mode=spec["static_mode"],
        out_dir=args.out_dir,
        lpips_params=load_torch_weights(),
        save_vis=True,
        tracker=tracker,
        mesh=build_eval_mesh(args),
    )
    result = ev.run(
        dataset,
        process_index=args.process_index,
        process_count=args.process_count,
        max_items=args.max_items,
    )
    print(json.dumps(result, indent=2))
    if args.out_dir:
        with open(pathlib.Path(args.out_dir) / "summary.json", "w") as f:
            json.dump(result, f, indent=2)


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s %(message)s"
    )
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--distributed", action="store_true",
                       help="call jax.distributed.initialize() (multi-host "
                       "pod/cluster; coordinator discovered from the "
                       "environment) and default --process-index/count to "
                       "this process's rank/world size")
        p.add_argument("--dataset", default="nvidia_eval")
        p.add_argument("--data-root", default=".")
        p.add_argument("--scene-ids", nargs="*", default=None)
        p.add_argument("--dataset-arg", nargs="*", default=None, metavar="K=V")
        p.add_argument("--render-cfg", nargs="*", default=None, metavar="K=V")
        p.add_argument("--static-mode", default="gnt", choices=["gnt", "geo"])
        p.add_argument("--gnt-ckpt", default=None)
        p.add_argument("--gnt-dtype", default="bfloat16")
        p.add_argument("--out-dir", default=None)
        p.add_argument("--process-index", type=int, default=0)
        p.add_argument("--process-count", type=int, default=1)
        p.add_argument("--devices", type=int, default=0,
                       help="local devices for in-engine eval DP (a (dp, rp) "
                       "mesh rendering that many views concurrently); "
                       "0 = all local devices, 1 = plain single-device jit")
        p.add_argument("--perf-preset", default="fast",
                       choices=["fast", "exact"],
                       help="fast (default): compile each config's fastest "
                       "serviceable kernel path (fused Pallas GNT + "
                       "patch/quad epipolar gather — the configuration "
                       "bench.py measures; numerics within bf16 rounding "
                       "of exact, see docs/BENCHMARK.md). exact: the "
                       "reference-faithful sampler. Explicit --render-cfg "
                       "flags override the preset knob-by-knob")

    pe = sub.add_parser("eval", help="evaluate on a dataset")
    common(pe)
    pe.add_argument("--max-items", type=int, default=-1)
    pe.add_argument("--save-vis", action="store_true")
    pe.set_defaults(fn=cmd_eval)

    pv = sub.add_parser("vis", help="render a visualization trajectory")
    common(pv)
    pv.set_defaults(fn=cmd_vis)

    pt = sub.add_parser("train", help="per-scene GNT fine-tuning")
    common(pt)
    pt.add_argument("--epochs", type=int, default=1)
    pt.add_argument("--lr", type=float, default=5e-4)
    pt.add_argument("--n-rays", type=int, default=512)
    pt.add_argument("--rp", type=int, default=1,
                    help="ray-parallel mesh axis size (dp = n_devices // rp)")
    pt.add_argument("--seed", type=int, default=0)
    pt.add_argument("--train-on", default="src", choices=["src", "tgt"],
                    help="src: hold one source view out as the photometric "
                    "target (honest). tgt: supervise on the item's target "
                    "view — on eval datasets that is the held-out ground "
                    "truth (test leakage); debugging only")
    pt.add_argument("--resume", action="store_true")
    pt.add_argument("--n-ckpts-keep", type=int, default=3)
    # training differentiates through the flax path (the fused kernel defines
    # no VJP), so the render-perf preset would only pollute the saved resume
    # config with inert knobs
    pt.set_defaults(fn=cmd_train, perf_preset="exact")

    pb = sub.add_parser("bench", help="run the throughput benchmark")
    pb.set_defaults(fn=cmd_bench)

    pbm = sub.add_parser(
        "benchmark", help="run a named benchmark_type ablation bundle"
    )
    common(pbm)
    pbm.add_argument("--benchmark-type", default="default")
    pbm.add_argument("--dataset-family", default="nvidia")
    pbm.add_argument("--max-items", type=int, default=-1)
    pbm.set_defaults(fn=cmd_benchmark)

    args = ap.parse_args(argv)
    _configure_jax()
    if getattr(args, "distributed", False):
        import jax

        jax.distributed.initialize()
        # DistributedSampler-style item striding follows the process grid
        # unless the user pinned it explicitly
        if args.process_count == 1:
            args.process_index = jax.process_index()
            args.process_count = jax.process_count()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
