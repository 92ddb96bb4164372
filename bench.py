#!/usr/bin/env python
"""Benchmark: AVID pretrain train-step throughput + MFU on the local chip(s).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
"mfu": ..., "secondary": {...}}.

Measures the full jitted hot path — device preprocessing (random-resized
crop/flip/jitter + matmul-DFT spectrogram) fused with the train step
(R(2+1)D-18 + Conv2D-10 forward, NCE vs 1024 negatives, backward, Adam,
bank EMA) — at the FLAGSHIP reference Kinetics recipe shape
(/root/reference/configs/main/avid/kinetics/Cross-N1024.yaml: 8 frames
@ 16 fps, 224^2 crop, batch 256 over 8 devices = 32/chip, 2 s audio ->
200x257 spectrogram), plus a secondary 112^2 measurement (the shape
benchmarked since round 1).

MFU: per-step FLOPs from XLA's compiled cost analysis divided by
(step time x chip peak). Peak bf16 FLOPs resolved from the device kind
(override with BENCH_PEAK_TFLOPS).

The tunneled chip on this host is time-sliced, so throughput is the BEST
of several measurement windows (standard practice on shared hardware).

vs_baseline: ratio against BASELINE_PERF.json's clips_per_sec_per_chip
(the derived PyTorch-GPU reference number at the same flagship shape; see
that file for the derivation), else 0.

Emission contract (round-5 hardening): the merged JSON line is printed and
flushed after EVERY completed measurement — headline first — so a driver
timeout can never erase the numbers already taken (the driver parses the
tail; the last complete line wins). A wall-clock budget (BENCH_TIME_BUDGET
seconds, default 2100) gates each secondary: when the remaining budget is
smaller than that secondary's worst-case cost it is skipped with a stderr
note instead of silently running the whole bench into the driver's
timeout (round 4's official record was rc=124 / no data for exactly this
reason).

Env knobs: BENCH_BATCH, BENCH_STEPS, BENCH_WINDOWS, BENCH_DTYPE=bf16|f32,
BENCH_SKIP_224, BENCH_SKIP_112, BENCH_SKIP_FINETUNE, BENCH_SKIP_MINING,
BENCH_SKIP_PIPELINE, BENCH_TIME_BUDGET, BENCH_PEAK_TFLOPS,
BENCH_COMPILE_CACHE.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# chip peak dense bf16 FLOPs/s by device kind (public cloud.google.com specs)
PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def peak_flops_per_chip() -> float:
    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    kind = jax.devices()[0].device_kind
    for prefix, peak in PEAK_BF16.items():
        if kind.startswith(prefix):
            return peak
    return 0.0


def best_of_windows(step_once, sync, batch, steps, windows) -> float:
    """Best-of-N-windows items/sec: `step_once()` advances one step,
    `sync()` fences the device (a host fetch of the last metrics — the
    portable fence on this tunneled runtime). Best-of windows because the
    chip is time-sliced (module docstring)."""
    best = 0.0
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            step_once()
        sync()
        dt = time.perf_counter() - t0
        best = max(best, batch * steps / dt)
    return best


def measure(batch, crop, frames, steps, windows, dtype, dtype_name):
    from avid_cma_tpu.criterions import AVIDConfig
    from avid_cma_tpu.data.pipelines import PreprocessConfig, preprocess_batch
    from avid_cma_tpu.models import av_wrapper
    from avid_cma_tpu.parallel.mesh import make_mesh
    from avid_cma_tpu.train.optim import build_optimizer, multistep_schedule
    from avid_cma_tpu.train.step import init_train_state, make_fused_train_step

    mesh = make_mesh()
    model = av_wrapper(
        video_backbone="R2Plus1D",
        video_backbone_args={"depth": 18},
        audio_backbone="Conv2D",
        audio_backbone_args={"depth": 10},
        proj_dim=[512, 512, 128],
        dtype=dtype,
    )
    cfg = AVIDConfig(num_data=232067, embedding_dim=128, num_negatives=1024,
                     momentum=0.5)
    pp = PreprocessConfig(
        crop_size=crop, audio_fps=24000, n_fft=512,
        spectrogram_fps=100.0, audio_clip_duration=2.0,
        # default matches the PRODUCTION default (canonical);
        # BENCH_JITTER_ORDER=random A/Bs the reference-parity shuffled
        # order in the full fused step (PERF.md records both: 507.6
        # canonical vs 464.6 random)
        jitter_order=os.environ.get("BENCH_JITTER_ORDER", "canonical"),
    )

    # raw decode output: short side ~1.14x crop (reference MSC crop source)
    raw_h, raw_w = int(crop * 8 / 7), int(crop * 10 / 7)
    rng = np.random.default_rng(0)
    raw = {
        "frames": rng.integers(0, 255, (batch, frames, raw_h, raw_w, 3),
                               dtype=np.uint8),
        "audio": rng.normal(size=(batch, 48000)).astype(np.float32),
        "index": np.arange(batch, dtype=np.int32),
    }
    opt = build_optimizer("adam", multistep_schedule(2e-4, [10], 1.0, 1000),
                          weight_decay=1e-5)

    key = jax.random.key(0)
    sample = preprocess_batch(key, raw, pp, train=True)
    state = init_train_state(key, model, sample, opt, cfg)
    # the production fused step: ONE dispatch per batch (preprocessing
    # traced into the program), train state donated (in-place updates)
    fused_step = make_fused_train_step(model, cfg, opt, mesh, pp, seed=0)

    raw_dev = jax.device_put(raw)  # the input pipeline would keep batches
    # on device via double-buffered prefetch; don't measure cold H2D.

    # ONE compile: the AOT-compiled executable both yields the cost
    # analysis and runs the loop (the jit dispatch cache is separate, so
    # compiling for cost_analysis and then calling fused_step(...) would
    # compile this minutes-long program twice)
    i0 = jnp.int32(0)  # concrete aval: Compiled.call is strict about
    # weak-vs-strong scalar types, so lower and call with the same kind
    compiled = fused_step.lower(state, raw_dev, i0).compile()
    flops = 0.0
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        pass

    # warmup (first run also faults pages / initializes buffers)
    state, metrics = compiled(state, raw_dev, i0)
    float(np.asarray(metrics["loss"]))

    box = {"state": state, "metrics": metrics, "i": 1}

    def step_once():
        box["state"], box["metrics"] = compiled(
            box["state"], raw_dev, jnp.int32(box["i"])
        )
        box["i"] += 1

    best = best_of_windows(
        step_once, lambda: float(np.asarray(box["metrics"]["loss"])),
        batch, steps, windows,
    )

    n_chips = jax.device_count()
    clips_per_sec_per_chip = best / n_chips
    peak = peak_flops_per_chip()
    mfu = 0.0
    if flops and peak:
        flops_per_sec_per_chip = flops * (clips_per_sec_per_chip / batch)
        mfu = flops_per_sec_per_chip / peak
    return {
        "metric": (
            f"avid_pretrain_clips_per_sec_per_chip_b{batch}_{frames}x{crop}_"
            + dtype_name
        ),
        "value": round(clips_per_sec_per_chip, 2),
        "unit": "clips/s/chip",
        "mfu": round(mfu, 4),
        "flops_per_step": flops,
    }


def measure_pipeline(batch, crop, frames, windows, dtype, dtype_name,
                     workers, loader_kind, batches_per_epoch=8) -> dict:
    """End-to-end input pipeline throughput: production loader (synthetic
    decode at the raw decode size) -> device_prefetch (async H2D) ->
    fused train step. Sustained clips/s/chip INCLUDING host decode,
    collate, and transfers — the half of the perf story the device-only
    headline (measure) excludes; the reference pays this with 36-72
    DataLoader worker processes (utils/main_utils.py:138-228).

    Also reports the components: loader-only drain rate (host ceiling),
    single-thread decode ms/clip (worker budget), and the H2D-inclusive
    device rate with resident host batches (transfer ceiling: what the
    pipeline would sustain with an infinitely fast host).
    """
    from avid_cma_tpu.config import Config
    from avid_cma_tpu.criterions import AVIDConfig
    from avid_cma_tpu.data.pipelines import PreprocessConfig, preprocess_batch
    from avid_cma_tpu.data.prefetch import device_prefetch
    from avid_cma_tpu.models import av_wrapper
    from avid_cma_tpu.parallel.mesh import make_mesh
    from avid_cma_tpu.train import builders
    from avid_cma_tpu.train.optim import build_optimizer, multistep_schedule
    from avid_cma_tpu.train.step import init_train_state, make_fused_train_step

    n_items = batch * batches_per_epoch
    db = Config({
        "name": "kinetics", "backend": "synthetic",
        "synthetic_size": n_items, "batch_size": batch,
        "video_clip_duration": frames / 16.0, "video_fps": 16.0,
        "crop_size": crop, "audio_clip_duration": 2.0,
        "audio_fps": 24000.0, "spectrogram_fps": 100.0, "n_fft": 512,
        # raw decode size: same 8/7-cover scale the device bench uses
        "decode_size": [int(crop * 8 / 7), int(crop * 10 / 7)],
        "train": {"split": "train", "use_augmentation": True,
                  "drop_last": True, "clips_per_video": 1},
    })
    ds = builders.build_dataset(db, db.train, mode="clip")
    loader = builders.build_dataloader(
        ds, db, db.train, num_workers=workers, kind=loader_kind
    )

    # single-thread decode budget (ms per clip, decode + snippet sample)
    t0 = time.perf_counter()
    n_probe = 8
    for i in range(n_probe):
        ds[i]
    decode_ms = (time.perf_counter() - t0) / n_probe * 1e3

    # loader-only drain: the host-side ceiling at this worker count
    loader.set_epoch(0)
    t0 = time.perf_counter()
    n_drained = sum(b["index"].shape[0] for b in loader)
    loader_rate = n_drained / (time.perf_counter() - t0)

    mesh = make_mesh()
    model = av_wrapper(
        video_backbone="R2Plus1D", video_backbone_args={"depth": 18},
        audio_backbone="Conv2D", audio_backbone_args={"depth": 10},
        proj_dim=[512, 512, 128], dtype=dtype,
    )
    cfg = AVIDConfig(num_data=232067, embedding_dim=128,
                     num_negatives=1024, momentum=0.5)
    pp = PreprocessConfig(crop_size=crop, audio_fps=24000, n_fft=512,
                          spectrogram_fps=100.0, audio_clip_duration=2.0)
    opt = build_optimizer("adam", multistep_schedule(2e-4, [10], 1.0, 1000),
                          weight_decay=1e-5)
    key = jax.random.key(0)
    loader.set_epoch(1)
    first = next(iter(loader))
    sample = preprocess_batch(key, first, pp, train=True)
    state = init_train_state(key, model, sample, opt, cfg)
    fused = make_fused_train_step(model, cfg, opt, mesh, pp, seed=0)

    box = {"state": state, "m": None, "i": 0}

    def run_epoch(epoch) -> float:
        """One full pass: loader -> prefetch -> step; returns seconds."""
        loader.set_epoch(epoch)
        t0 = time.perf_counter()
        for b in device_prefetch(loader, mesh):
            box["state"], box["m"] = fused(
                box["state"], b, jnp.int32(box["i"])
            )
            box["i"] += 1
        float(np.asarray(box["m"]["loss"]))  # fence
        return time.perf_counter() - t0

    run_epoch(2)  # warmup: compile + cache fill
    best = 0.0
    for w in range(windows):
        best = max(best, n_items / run_epoch(3 + w))

    # transfer ceiling: resident host batches (no decode) through the
    # same prefetch + step path — isolates H2D cost from host decode
    resident = [first] * batches_per_epoch
    h2d_best = 0.0
    for _ in range(windows):
        t0 = time.perf_counter()
        for b in device_prefetch(resident, mesh):
            box["state"], box["m"] = fused(
                box["state"], b, jnp.int32(box["i"])
            )
            box["i"] += 1
        float(np.asarray(box["m"]["loss"]))
        h2d_best = max(h2d_best, n_items / (time.perf_counter() - t0))

    n_chips = jax.device_count()
    return {
        "metric": (
            f"avid_pretrain_pipeline_clips_per_sec_per_chip_b{batch}_"
            f"{frames}x{crop}_{dtype_name}"
        ),
        "value": round(best / n_chips, 2),
        "unit": "clips/s/chip",
        "h2d_step_clips_per_sec_per_chip": round(h2d_best / n_chips, 2),
        "loader_only_clips_per_sec": round(loader_rate, 2),
        "decode_ms_per_clip_1thread": round(decode_ms, 2),
        "workers": workers,
        "loader": loader_kind,
        "host_cpus": os.cpu_count(),
    }


def measure_finetune(batch, steps, windows, dtype, dtype_name) -> dict:
    """UCF-101 full-finetune train-step throughput at the reference
    benchmark recipe shape (configs/benchmark/ucf/8at16-fold1.yaml:
    8 frames @ 16 fps, 224^2 crop, CrossEntropy over 101 classes,
    dropout head on the 'pool' tap) — the other half of the reference's
    headline protocol (eval-action-recg.py)."""
    from avid_cma_tpu.models.eval_wrappers import ClassificationWrapper
    from avid_cma_tpu.models.video import R2Plus1D
    from avid_cma_tpu.parallel.mesh import make_mesh
    from avid_cma_tpu.train.eval_loop import make_supervised_train_step
    from avid_cma_tpu.train.optim import build_optimizer
    from avid_cma_tpu.train.state import TrainState

    mesh = make_mesh()
    model = ClassificationWrapper(
        feature_extractor=R2Plus1D(depth=18, dtype=dtype),
        n_classes=101, feat_name="pool", use_dropout=True, dropout=0.5,
    )
    rng = np.random.default_rng(0)
    # preprocessed clips as the eval loop feeds them (f32, normalized)
    frames = jnp.asarray(
        rng.normal(size=(batch, 8, 224, 224, 3)), jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, 101, batch), jnp.int32)
    variables = model.init(jax.random.key(0), frames, train=False)
    opt = build_optimizer("adam", 1e-4, weight_decay=1e-5)
    state = TrainState(
        step=jnp.int32(0), epoch=jnp.int32(0), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt.init(variables["params"]), bank=None,
        rng=jax.random.key(0),
    )
    step = make_supervised_train_step(model, opt, mesh)
    state, m, _ = step(state, frames, labels)  # warmup / compile
    float(np.asarray(m["loss"]))
    box = {"state": state, "m": m}

    def step_once():
        box["state"], box["m"], _ = step(box["state"], frames, labels)

    best = best_of_windows(
        step_once, lambda: float(np.asarray(box["m"]["loss"])),
        batch, steps, windows,
    )
    return {
        "metric": (
            f"ucf_finetune_clips_per_sec_per_chip_b{batch}_8x224_"
            + dtype_name
        ),
        "value": round(best / jax.device_count(), 2),
        "unit": "clips/s/chip",
    }


def measure_mining() -> dict:
    """CMA positive-set mining at Kinetics scale (SURVEY hot loop #3):
    one exact blocked matmul+top-k sweep, N=232k x D=128, top-32."""
    from avid_cma_tpu.criterions.mining import mine_positives

    n, d = 232_067, 128
    rng = np.random.default_rng(0)
    bv = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    bv = bv / jnp.linalg.norm(bv, axis=1, keepdims=True)
    ba = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    ba = ba / jnp.linalg.norm(ba, axis=1, keepdims=True)
    out = mine_positives(bv, ba, 32, tile=1024)
    np.asarray(out)  # compile + run
    t0 = time.perf_counter()
    out = mine_positives(bv, ba, 32, tile=1024)
    # fetch the FULL result: pulling one element of one buffer is not
    # guaranteed to fence all output buffers on runtimes that complete
    # them asynchronously (block_until_ready is unreliable via the
    # tunnel, so a full D2H copy is the portable fence; the (N, 32) i32
    # copy is microseconds against a multi-second sweep)
    np.asarray(out)
    dt = time.perf_counter() - t0
    return {"metric": "cma_mining_sweep_sec_n232k_top32", "value": round(dt, 2),
            "unit": "s"}


def main():
    # persistent compile cache: the big programs cost minutes to compile
    # through the tunnel; repeat runs on the same host skip that. Set
    # BENCH_COMPILE_CACHE= (empty) to disable.
    cache = os.environ.get("BENCH_COMPILE_CACHE")
    if cache is None:
        # keyed by machine + jax version so entries always load cleanly
        # (utils/compile_cache.py); "bench" tag keeps the tunneled-TPU
        # programs out of the CPU test namespace
        from avid_cma_tpu.utils.compile_cache import cache_dir

        cache = cache_dir("bench")
    if cache:
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        except Exception:
            pass

    t_start = time.monotonic()
    budget = float(os.environ.get("BENCH_TIME_BUDGET", "2100"))

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    windows = int(os.environ.get("BENCH_WINDOWS", "5"))
    dtype_name = os.environ.get("BENCH_DTYPE", "bf16")
    if dtype_name not in ("bf16", "f32"):
        sys.exit(f"BENCH_DTYPE must be bf16|f32, got {dtype_name!r}")
    dtype = {"bf16": jnp.bfloat16, "f32": None}[dtype_name]

    baseline = 0.0
    baseline_info = {}
    if os.path.isfile("BASELINE_PERF.json"):
        try:
            baseline_info = json.load(open("BASELINE_PERF.json"))
            baseline = float(baseline_info["clips_per_sec_per_chip"])
        except Exception:
            baseline = 0.0

    # headline: the 224 flagship shape (112 only as a fallback headline
    # when 224 is explicitly skipped)
    headline = None
    headline_is_flagship = False
    if not os.environ.get("BENCH_SKIP_224"):
        headline = measure(batch, 224, 8, steps, windows, dtype, dtype_name)
        headline_is_flagship = True
    elif not os.environ.get("BENCH_SKIP_112"):
        headline = measure(batch, 112, 8, steps, windows, dtype, dtype_name)
    if headline is None:
        headline = {"metric": "no_shape_measured", "value": 0.0, "unit": "",
                    "mfu": 0.0, "flops_per_step": 0.0}

    out = dict(headline)
    out.pop("flops_per_step", None)
    # vs_baseline is only meaningful against the 224 flagship shape the
    # baseline file documents — comparing the 112 secondary against it
    # (BENCH_SKIP_224 runs) would inflate the ratio ~4x
    out["vs_baseline"] = (
        round(headline["value"] / baseline, 3)
        if baseline > 0 and headline_is_flagship
        else 0.0
    )
    out["secondary"] = {}
    if baseline_info:
        out["baseline"] = {
            "clips_per_sec_per_chip": baseline,
            # this is NOT a measured-vs-measured ratio: the reference
            # number is derived (compute-roofline estimate for the torch
            # V100 stack; see BASELINE_PERF.json for the derivation)
            "baseline_kind": baseline_info.get("kind", "derived-estimate"),
            "hardware": baseline_info.get("hardware"),
        }

    def emit():
        # the driver-facing record: re-print the MERGED line after every
        # completed measurement and flush, so the numbers taken so far
        # survive a driver timeout (it parses the tail; last line wins)
        print(json.dumps(out), flush=True)

    emit()  # the headline is on the record before any secondary starts

    def run_secondary(name, est_cost, skip_env, fn):
        """Best-effort + budget-gated: a broken measurement must be
        VISIBLE (stderr), not indistinguishable from BENCH_SKIP_*; one
        that can't finish inside the wall-clock budget is skipped so the
        bench never runs itself into the driver's timeout."""
        if os.environ.get(skip_env):
            return
        left = budget - (time.monotonic() - t_start)
        if left < est_cost:
            print(
                f"bench: skipping {name} secondary: {left:.0f}s of budget "
                f"left < est. {est_cost:.0f}s cost (BENCH_TIME_BUDGET="
                f"{budget:.0f})",
                file=sys.stderr,
            )
            return
        try:
            out["secondary"][name] = fn()
        except Exception as e:
            print(f"bench: {name} secondary failed: {e!r}", file=sys.stderr)
        else:
            emit()

    # cost estimates are worst-case COLD (fresh compile through the
    # tunnel); with a warm persistent cache each runs far faster
    run_secondary(
        "finetune", 420, "BENCH_SKIP_FINETUNE",
        lambda: measure_finetune(batch, steps, windows, dtype, dtype_name),
    )
    run_secondary("mining", 240, "BENCH_SKIP_MINING", measure_mining)
    if headline_is_flagship:
        def _measure_112():
            r = measure(batch, 112, 8, steps, windows, dtype, dtype_name)
            return {k: r[k] for k in ("metric", "value", "mfu")}

        run_secondary("112", 420, "BENCH_SKIP_112", _measure_112)
    run_secondary(
        "pipeline", 700, "BENCH_SKIP_PIPELINE",
        lambda: measure_pipeline(
            batch, 224, 8, max(2, windows // 2), dtype, dtype_name,
            workers=int(os.environ.get(
                "BENCH_PIPELINE_WORKERS",
                str(min(16, max(4, (os.cpu_count() or 1) * 4))),
            )),
            loader_kind=os.environ.get("BENCH_PIPELINE_LOADER", "threaded"),
        ),
    )
    emit()  # final merged record


if __name__ == "__main__":
    main()
