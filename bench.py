"""Benchmark: the three BASELINE.json metrics on one TPU chip.

Default invocation prints THREE JSON lines, one per metric — CLIP ViT-B/16
pairs/s, LLaVA-1.5-7B decode tokens/s, and (last, the flagship) SDXL 1024px
imgs/s — each {"metric", "value", "unit", "vs_baseline"}. The CLIP/LLaVA
sub-benches run in their own subprocesses (own HBM arena, crash isolation);
BENCH_MODE=sdxl|llava|clip runs a single metric.
Baseline: BASELINE.json target SDXL 1024px >= 1.5 imgs/s/chip on v5e.

Measures the denoise loop (CFG batch 2, 25 steps, bf16) + VAE decode with the
real SDXL UNet/VAE architectures (random weights — no checkpoints offline; the
compute cost is weight-value independent). Text encoding is <2% of step cost
and excluded. The whole loop runs inside ONE jitted lax.fori_loop so dispatch
overhead is amortized (pipelines do the same, see
paddlemix_tpu/diffusers/pipelines/stable_diffusion.py).

Env knobs: BENCH_STEPS (default 25), BENCH_RES (default 1024), BENCH_REPS (3),
BENCH_BATCH (default 1; throughput mode batches multiple images per denoise).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from __graft_entry__ import SDXL_UNET, _unet  # noqa: E402


def _constant_fill(shapes):
    """Materialize a param tree with constant fills (timing is value-
    independent; per-leaf random programs cost minutes of relay compile)."""
    import jax
    import jax.numpy as jnp

    def fill(l):
        if l.dtype == jnp.int8:
            return jnp.full(l.shape, 23, jnp.int8)
        if l.ndim == 1 and l.dtype == jnp.float32:
            return jnp.full(l.shape, 2e-4, jnp.float32)  # wint8/norm scales
        return jnp.full(l.shape, 0.02, l.dtype)

    return jax.jit(lambda: jax.tree_util.tree_map(fill, shapes))()


def bench_llava_decode():
    """LLaVA-1.5-7B REAL path: CLIP ViT-L/14-336 tower + mlp2x projector +
    token splice + Llama-7B greedy decode. Reports tokens/s AND TTFT
    (BASELINE metric 2). Random weights — no checkpoints offline; compute
    cost is weight-value independent.

    vs_baseline normalizes against 165 tok/s: a REALISTIC H100 single-stream
    Llama-7B decode rate (int8 weights, ~3.35 TB/s HBM; public vLLM/TRT-LLM
    single-request numbers land at 150-180 tok/s). The reference repo
    publishes no absolute tokens/s for this path."""
    import jax
    import jax.numpy as jnp

    from paddlemix_tpu.models.llava import LlavaConfig, LlavaForConditionalGeneration

    new_tokens = int(os.environ.get("BENCH_NEW_TOKENS", 128))
    # a8w4 decode by default — the fastest measured mode on v5e (174.3 vs
    # 103.4 tok/s a8w8, README waterfall) and the analogue of the reference
    # deploy's --quant_type weight_only_int4 (deploy/llava/README.md); the
    # quant-quality guardrail (tests/test_quant_quality.py) bounds its
    # logit drift. BENCH_QUANT=a8w8|none for the other modes.
    quant = os.environ.get("BENCH_QUANT", "a8w4")
    if quant in ("none", "bf16"):
        quant = None
    tiny = os.environ.get("BENCH_TINY") == "1"  # CI smoke of this path
    vis = (dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                num_attention_heads=2, image_size=28, patch_size=14,
                projection_dim=16) if tiny else
           dict(hidden_size=1024, intermediate_size=4096,
                num_hidden_layers=24, num_attention_heads=16,
                image_size=336, patch_size=14, projection_dim=768))
    cfg = LlavaConfig(
        vision_config=vis,
        text_config=dict(vocab_size=32000,
                         hidden_size=32 if tiny else 4096,
                         intermediate_size=64 if tiny else 11008,
                         num_hidden_layers=1 if tiny else 32,
                         num_attention_heads=2 if tiny else 32,
                         num_key_value_heads=2 if tiny else 32,
                         max_position_embeddings=4096, quant=quant,
                         fused_qkv=os.environ.get("BENCH_FUSED", "0") == "1",
                         scan_layers=os.environ.get("BENCH_SCAN", "0") == "1",
                         cachekv_int8=os.environ.get("BENCH_KV", "") == "int8"),
    )
    model = LlavaForConditionalGeneration(cfg, dtype=jnp.bfloat16)
    args, kwargs = LlavaForConditionalGeneration.example_inputs(cfg)
    shapes = jax.eval_shape(
        lambda: model.module.init(jax.random.PRNGKey(0), *args, **kwargs))["params"]
    model.params = _constant_fill(shapes)

    n_img = cfg.num_image_tokens  # 576 (4 under BENCH_TINY)
    text_len = 32
    ids = np.full((1, n_img + text_len), 5, np.int32)
    ids[:, 1:1 + n_img] = cfg.image_token_index
    ids = jnp.asarray(ids)
    isz = cfg.vision.image_size
    px = jnp.zeros((1, isz, isz, 3), jnp.float32)

    # NOTE: through the axon relay, block_until_ready can return before
    # execution finishes — a host fetch of the (tiny) output is the only
    # reliable fence (see memory: axon-tpu-benchmarking)
    def run(n):
        out = model.generate(ids, pixel_values=px, max_new_tokens=n,
                             eos_token_id=-1)
        np.asarray(out)

    t0 = time.time()
    run(1)
    compile1_s = time.time() - t0
    t0 = time.time()
    run(new_tokens)
    compile_s = time.time() - t0

    def med(n, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            run(n)
            ts.append(time.time() - t0)
        return float(np.median(ts))

    ttft = med(1)         # image encode + splice + prefill + first token
    total = med(new_tokens)
    tps = (new_tokens - 1) / max(total - ttft, 1e-9)
    print(json.dumps({
        "metric": "llava7b_decode_tokens_per_sec_per_chip",
        "value": round(tps, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tps / 165.0, 4),  # honest H100 single-stream rate
        "ttft_ms": round(ttft * 1e3, 1),
    }))
    print(f"# real llava path (vit-l/14-336 + splice + llama7b {quant or 'bf16'})"
          f" ttft={ttft*1e3:.0f}ms total={total:.2f}s prompt={n_img + text_len}"
          f" new={new_tokens} compile={compile1_s:.0f}+{compile_s:.0f}s",
          file=sys.stderr)


def bench_clip_pairs():
    """CLIP ViT-B/16 contrastive forward: image-text pairs/s at batch
    (BASELINE metric 3 — dual-tower encode + normalized logits).

    vs_baseline is MFU against the v5e bf16 peak (197 TFLOP/s): 1.0 = chip
    speed-of-light for the analytic FLOP count. No published reference
    number exists for CLIP inference pairs/s (BASELINE.md), so the roofline
    is the only non-self-flattering yardstick.

    r5 where-the-MFU-goes (xprof, tools/profile_clip.py, batch 256): the
    matmuls are fine; the tower is bounded by (a) LayerNorm — XLA's fp32
    convert+reduce composition runs ~10x its HBM roofline, 0.66 ms per
    (256,197,768) LN (the Pallas fused LN measures the same and also breaks
    the residual fusion — models/layers.py note); (b) attention at the
    unaligned seq 197 — the flash custom-call forced (B,S,H,D)->(B,H,S,D)
    layout copies (8 ms/fwd), so ops/attention.py now routes unaligned short
    seqs to XLA math (163.7 -> 138.6 ms/batch, +18%); (c) batch sweep:
    256 = 1847, 512 = 1661 (flash), 1024 = 1816 pairs/s — 256+math is the
    recorded optimum."""
    import jax
    import jax.numpy as jnp

    from paddlemix_tpu.models.clip import CLIPConfig, CLIPModel

    tiny = os.environ.get("BENCH_TINY") == "1"
    batch = int(os.environ.get("BENCH_BATCH", 8 if tiny else 256))
    cfg = CLIPConfig(
        vision_config=dict(hidden_size=32 if tiny else 768,
                           intermediate_size=64 if tiny else 3072,
                           num_hidden_layers=1 if tiny else 12,
                           num_attention_heads=2 if tiny else 12,
                           image_size=32 if tiny else 224,
                           patch_size=16),
        text_config=dict(hidden_size=32 if tiny else 512,
                         intermediate_size=64 if tiny else 2048,
                         num_hidden_layers=1 if tiny else 12,
                         num_attention_heads=2 if tiny else 8,
                         max_position_embeddings=77),
        projection_dim=16 if tiny else 512,
    )
    model = CLIPModel(cfg, dtype=jnp.bfloat16)
    args, kwargs = CLIPModel.example_inputs(cfg)
    shapes = jax.eval_shape(
        lambda: model.module.init(jax.random.PRNGKey(0), *args, **kwargs))["params"]
    model.params = _constant_fill(shapes)

    isz = 32 if tiny else 224
    px = jnp.zeros((batch, isz, isz, 3), jnp.bfloat16)
    ids = jnp.ones((batch, 77), jnp.int32)

    @jax.jit
    def fwd(params, px, ids):
        img, txt, scale = model.module.apply({"params": params}, px, ids)
        return (scale * img @ txt.T)

    reps = int(os.environ.get("BENCH_REPS", 5))
    t0 = time.time()
    np.asarray(fwd(model.params, px, ids)[0, 0])
    compile_s = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fwd(model.params, px, ids)[0, 0])
        times.append(time.time() - t0)
    sec = float(np.median(times))
    pairs_per_sec = batch / sec

    # analytic forward FLOPs: dense 2*tokens*d_in*d_out per matmul + attention
    def tower_flops(n, d, dff, layers):
        per_layer = 2 * n * d * (4 * d + 2 * dff) + 2 * 2 * n * n * d
        return layers * per_layer

    v = cfg.vision
    n_tok = (v.image_size // v.patch_size) ** 2 + 1
    flops = batch * (
        tower_flops(n_tok, 768, 3072, 12)
        + 2 * n_tok * (3 * 16 * 16) * 768          # patch embed
        + tower_flops(77, 512, 2048, 12)
        + 2 * (768 * 512 + 512 * 512))             # projections
    sol = flops / 197e12
    print(json.dumps({
        "metric": "clip_vitb16_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s/chip",
        "vs_baseline": round(sol / sec, 4),  # MFU vs v5e bf16 peak
    }))
    print(f"# batch={batch} {sec*1e3:.1f}ms/batch mfu={sol/sec:.1%} "
          f"analytic={flops/1e9:.0f} GF/batch compile={compile_s:.0f}s",
          file=sys.stderr)


def _run_submode(mode):
    """Run one bench mode in a fresh subprocess (own HBM arena, crash
    isolation) and forward its JSON line(s) to our stdout."""
    import subprocess

    env = dict(os.environ, BENCH_MODE=mode)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env,
        capture_output=True, text=True, timeout=1800)
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            print(line)
    tail = "\n".join(proc.stderr.strip().splitlines()[-3:])
    print(f"# [{mode}] {tail}", file=sys.stderr)
    if proc.returncode != 0:
        print(f"# [{mode}] FAILED rc={proc.returncode}", file=sys.stderr)


def main():
    if os.environ.get("BENCH_MODE") == "llava":
        bench_llava_decode()
        return
    if os.environ.get("BENCH_MODE") == "clip":
        bench_clip_pairs()
        return
    if os.environ.get("BENCH_MODE") not in (None, "", "all", "sdxl"):
        raise SystemExit(f"unknown BENCH_MODE={os.environ['BENCH_MODE']}")
    if os.environ.get("BENCH_MODE") in (None, "", "all"):
        # default invocation reports ALL THREE BASELINE metrics (BASELINE.json:
        # SDXL imgs/s + LLaVA tok/s + CLIP pairs/s), each in its own process
        # so the 7B LLaVA params and the SDXL UNet never share the 16G HBM.
        # SDXL (the flagship metric) runs last in THIS process, so its JSON is
        # the final line.
        for mode in ("clip", "llava"):
            try:
                _run_submode(mode)
            except Exception as e:  # a sub-bench must never sink the flagship
                print(f"# [{mode}] error: {e}", file=sys.stderr)
    steps = int(os.environ.get("BENCH_STEPS", 25))
    res = int(os.environ.get("BENCH_RES", 1024))
    reps = int(os.environ.get("BENCH_REPS", 5))
    batch = int(os.environ.get("BENCH_BATCH", 1))
    lat = res // 8

    from paddlemix_tpu.diffusers.models import AutoencoderKL, AutoencoderKLConfig
    from paddlemix_tpu.diffusers.schedulers import EulerDiscreteScheduler

    # optional fast path (reference counterparts: triton weight_only_int8,
    # tomesd): int8 a8w8 matmuls/convs and/or ToMe self-attn token merging
    unet_cfg = dict(SDXL_UNET)
    if os.environ.get("BENCH_TINY") == "1":  # CI smoke of the default mode
        unet_cfg.update(block_out_channels=(16, 32, 32),
                        num_attention_heads=(1, 2, 2),
                        transformer_layers_per_block=(1, 1, 1),
                        layers_per_block=1, cross_attention_dim=32,
                        addition_time_embed_dim=8,
                        projection_class_embeddings_input_dim=8 * 6 + 16,
                        norm_num_groups=8)
        res = min(res, 64)
        lat = res // 8
    # default fast path: static-scale a8w8 PTQ (trace-order calibration).
    # Measured v5e: 0.42 imgs/s vs 0.35 bf16 vs 0.21 dynamic a8w8 — static
    # scales remove the per-step amax reduces that sank the dynamic mode.
    # BENCH_QUANT=none for the pure-bf16 number.
    quant_mode = os.environ.get("BENCH_QUANT", "a8w8_static")
    if quant_mode in ("none", "bf16"):
        quant_mode = ""
    if quant_mode:
        unet_cfg["quant"] = quant_mode
    if os.environ.get("BENCH_TOME"):
        unet_cfg["tome_ratio"] = float(os.environ["BENCH_TOME"])
    t_setup = time.time()
    unet = _unet(unet_cfg, jnp.bfloat16)
    print(f"# unet built {time.time()-t_setup:.0f}s", file=sys.stderr)

    # SDXL VAE (random weights, real architecture). The decoder carries ~58 ms
    # of 3x3 convs at 1024px (xprof, tools/profile_vae.py) — quantize it with
    # the same static-scale a8w8 recipe as the UNet (BENCH_VAE_QUANT=0 for bf16)
    vae_quant = (quant_mode == "a8w8_static"
                 and os.environ.get("BENCH_VAE_QUANT", "1") == "1")
    vae_cfg = AutoencoderKLConfig(sample_size=res, scaling_factor=0.13025,
                                  quant="a8w8_static" if vae_quant else None)
    vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)
    v_args, v_kwargs = AutoencoderKL.example_inputs(vae_cfg)
    v_shapes = jax.eval_shape(
        lambda: vae.module.init(jax.random.PRNGKey(0), *v_args, **v_kwargs))["params"]

    # constant fill (values are timing-irrelevant; the per-leaf random-normal
    # program costs ~1 min of relay compile, see __graft_entry__._unet)
    vae.params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda l: jnp.full(l.shape, 0.02, jnp.bfloat16), v_shapes))()
    print(f"# vae built {time.time()-t_setup:.0f}s", file=sys.stderr)

    scheduler = EulerDiscreteScheduler(
        num_train_timesteps=1000, beta_schedule="scaled_linear",
        beta_start=0.00085, beta_end=0.012, timestep_spacing="leading")
    state = scheduler.set_timesteps(steps)

    ctx_dim = unet_cfg.get("cross_attention_dim", 2048)
    context = jax.random.normal(jax.random.PRNGKey(2),
                                (2 * batch, 77, ctx_dim), jnp.bfloat16)
    text_dim = (unet_cfg.get("projection_class_embeddings_input_dim", 2816)
                - 6 * unet_cfg.get("addition_time_embed_dim", 256))
    text_embeds = jax.random.normal(jax.random.PRNGKey(3),
                                    (2 * batch, text_dim), jnp.bfloat16)
    time_ids = jnp.tile(jnp.asarray([[res, res, 0, 0, res, res]], jnp.bfloat16), (2 * batch, 1))
    latents0 = jax.random.normal(jax.random.PRNGKey(4), (batch, lat, lat, 4), jnp.float32)

    gs = jnp.asarray(5.0, jnp.float32)

    def make_denoise_and_decode(n_steps):
        def denoise_and_decode(unet_params, vae_params, latents, state):
            def body(i, carry):
                latents, state = carry
                t = state.timesteps[jnp.minimum(i, steps - 1)]
                lat_in = jnp.concatenate([latents, latents])
                lat_in = scheduler.scale_model_input(state, lat_in,
                                                     jnp.minimum(i, steps - 1))
                t_in = jnp.broadcast_to(t, (2 * batch,))
                noise = unet.module.apply(
                    {"params": unet_params}, lat_in.astype(jnp.bfloat16), t_in,
                    context, added_cond_kwargs={"text_embeds": text_embeds,
                                                "time_ids": time_ids}).astype(jnp.float32)
                un, co = jnp.split(noise, 2)
                noise = un + gs * (co - un)
                latents, state = scheduler.step(state, noise,
                                                jnp.minimum(i, steps - 1), latents)
                return latents, state

            latents, _ = jax.lax.fori_loop(0, n_steps, body, (latents, state))
            img = vae.module.apply({"params": vae_params},
                                   (latents / 0.13025).astype(jnp.bfloat16),
                                   method=vae.module.decode)
            return img

        return denoise_and_decode

    run = jax.jit(make_denoise_and_decode(steps))
    # 2N-step twin for the two-point slope fit (tools/calibrate_timing.py
    # methodology: fixed dispatch/relay overhead cancels in T(2N) - T(N));
    # scheduler indices clamp to the real schedule so only step COUNT changes
    run2 = jax.jit(make_denoise_and_decode(2 * steps))
    latents = latents0 * scheduler.init_noise_sigma

    import contextlib
    quant_ctx = contextlib.nullcontext()
    if quant_mode == "a8w8_static":
        # static-scale PTQ via trace-order scales (ops/quant.py
        # static_a8w8_scope): one compiled calibration forward records each
        # quantized op's activation absmax in call order; the denoise trace
        # then consumes them as baked constants — no per-step amax reduces
        # (the cost that made dynamic a8w8 a net loss), no flax interception
        # (minutes of Python at SDXL scale, see ops/static_quant.py)
        from paddlemix_tpu.ops.quant import static_a8w8_scope

        t_in0 = jnp.broadcast_to(state.timesteps[0], (2 * batch,))
        lat0_in = jnp.concatenate([latents0, latents0]).astype(jnp.bfloat16)

        def calib(params, lat_in, t_in, context):
            with static_a8w8_scope("record") as ctx:
                unet.module.apply({"params": params}, lat_in, t_in, context,
                                  added_cond_kwargs={"text_embeds": text_embeds,
                                                     "time_ids": time_ids})
            return jnp.stack(ctx.scales)

        def calib_vae(vparams, z):
            # VAE decoder scales, recorded separately and APPENDED: the
            # denoise trace consumes scales in call order (UNet loop body
            # first, then vae.decode), so apply = unet_scales + vae_scales
            with static_a8w8_scope("record") as ctx:
                vae.module.apply({"params": vparams}, z, method=vae.module.decode)
            return jnp.stack(ctx.scales)

        # the axon relay never persists XLA executables, so the 771-output
        # calibration program recompiles every run (~4-9 min). The scales are
        # deterministic (seeded random weights) — cache them on disk, keyed
        # by model identity (param-shape fingerprint) as well as shape so a
        # config change can never reuse stale scales
        import hashlib

        shape_sig = hashlib.sha1(str(sorted(
            (("/".join(map(str, path)), tuple(leaf.shape))
             for path, leaf in
             jax.tree_util.tree_flatten_with_path(unet.params)[0])
        )).encode()).hexdigest()[:10]
        vtag = "_vq" if vae_quant else ""
        cache_f = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               f".bench_scales_sdxl_{res}_{batch}_{shape_sig}{vtag}.npy")
        if os.path.exists(cache_f):
            scales = np.load(cache_f)
            print(f"# loaded {len(scales)} calibrated scales from cache",
                  file=sys.stderr)
        else:
            scales = np.asarray(jax.jit(calib)(unet.params, lat0_in, t_in0, context))
            if vae_quant:
                vs = np.asarray(jax.jit(calib_vae)(
                    vae.params, (latents0 / 0.13025).astype(jnp.bfloat16)))
                scales = np.concatenate([scales, vs])
            np.save(cache_f, scales)
            print(f"# calibrated {len(scales)} quantized ops", file=sys.stderr)
        quant_ctx = static_a8w8_scope("apply", [float(v) for v in scales])

    import contextlib as _ctx

    t0 = time.time()
    with quant_ctx:  # active during trace: bakes a8w8 into the program
        img = run(unet.params, vae.params, latents, state)
    np.asarray(img[0, :2, :2])  # tiny host fetch: reliable completion fence
    compile_s = time.time() - t0
    slope = os.environ.get("BENCH_SLOPE", "1") == "1"
    if slope:
        with (static_a8w8_scope("apply", [float(v) for v in scales])
              if quant_mode == "a8w8_static" else _ctx.nullcontext()):
            img2 = run2(unet.params, vae.params, latents, state)
        np.asarray(img2[0, :2, :2])

    def med(fn):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            img = fn(unet.params, vae.params, latents, state)
            np.asarray(img[0, :2, :2])
            ts.append(time.time() - t0)
        return float(np.median(ts)), float(np.max(ts) - np.min(ts))

    def overlapped(fn, n):
        """Throughput timing: enqueue n runs back-to-back (jax dispatch is
        async), fence once — host-side relay dispatch (~30-90 ms/call here,
        the r4 regression's whole variance) overlaps device compute, as any
        serving loop would arrange."""
        outs = []
        t0 = time.time()
        for _ in range(n):
            outs.append(fn(unet.params, vae.params, latents, state))
        for o in outs:
            np.asarray(o[0, :2, :2])
        return (time.time() - t0) / n

    t1, band1 = med(run)
    t_ov = overlapped(run, max(reps, 3))
    sec_per_image = min(t1, t_ov) / batch
    imgs_per_sec = 1.0 / sec_per_image
    extra = {}
    if slope:
        # two-point fit: fixed dispatch/relay overhead + VAE cancel in the
        # difference, so step_ms is a variance-hardened per-step time and
        # fixed_ms isolates VAE decode + dispatch
        t2, band2 = med(run2)
        step_ms = (t2 - t1) / steps * 1e3
        # MFU vs the v5e bf16 peak (197 TF/s): the SDXL UNet forward is
        # ~12.4 TFLOP at CFG batch 2 per image (README rooflines); bf16
        # speed-of-light at this recipe is ~62 ms/step/image
        unet_tflop = 12.4 * batch * (res / 1024) ** 2
        mfu = unet_tflop / max(step_ms, 1e-9) * 1e3 / 197.0
        extra = {"step_ms": round(step_ms, 2),
                 "fixed_ms": round((t1 - step_ms * steps / 1e3) * 1e3, 1),
                 "latency_s_per_img": round(t1 / batch, 4),
                 "overlapped_s_per_img": round(t_ov / batch, 4),
                 "rep_band_ms": round(max(band1, band2) * 1e3, 1),
                 "mfu_vs_bf16_peak": round(mfu, 4),
                 "sol_bf16_imgs_per_sec": round(1.0 / (62e-3 * steps), 3)}

    print(json.dumps({
        "metric": f"sdxl_{res}px_{steps}step_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 4),
        "unit": "imgs/s/chip",
        "vs_baseline": round(imgs_per_sec / 1.5, 4),
        "quant": quant_mode or "bf16", "batch": batch, **extra,
    }))
    print(f"# compile={compile_s:.1f}s warm={sec_per_image:.3f}s/img "
          f"steps={steps} res={res} batch={batch} device={jax.devices()[0]}", file=sys.stderr)


if __name__ == "__main__":
    main()
