"""Community-pipeline tests (reference ppdiffusers/examples/community/)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tests")

from paddlemix_tpu.diffusers import DDIMScheduler, DDPMScheduler
from paddlemix_tpu.diffusers.pipelines import (
    CLIPGuidedStableDiffusionPipeline,
    StableDiffusionHiresFixPipeline,
    StableDiffusionLongPromptPipeline,
    StableDiffusionWalkPipeline,
    get_weighted_text_embeddings,
    merge_checkpoints,
    parse_prompt_attention,
    slerp,
)
from test_pipelines import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae


def test_parse_prompt_attention_grammar():
    # the reference's doctest cases (lpw_stable_diffusion.py:76-95)
    assert parse_prompt_attention("normal text") == [["normal text", 1.0]]
    assert parse_prompt_attention("an (important) word") == [
        ["an ", 1.0], ["important", 1.1], [" word", 1.0]]
    assert parse_prompt_attention("(unbalanced") == [["unbalanced", 1.1]]
    assert parse_prompt_attention(r"\(literal\]") == [["(literal]", 1.0]]
    assert parse_prompt_attention("(unnecessary)(parens)") == [
        ["unnecessaryparens", 1.1]]
    out = parse_prompt_attention(
        "a (((house:1.3)) [on] a (hill:0.5), sun, (((sky))).")
    texts = [t for t, _ in out]
    weights = [w for _, w in out]
    assert texts == ["a ", "house", " ", "on", " a ", "hill", ", sun, ",
                     "sky", "."]
    np.testing.assert_allclose(
        weights, [1.0, 1.573, 1.1, 1.0, 1.1, 0.55, 1.1, 1.4641, 1.1],
        rtol=1e-9)


def test_weighted_embeddings_chunking_and_mean():
    tok = tiny_tokenizer(max_len=16)
    enc = tiny_text_encoder(tok)
    long_prompt = " ".join(["word"] * 40)  # >1 chunk of 14 payload tokens
    emb = get_weighted_text_embeddings(tok, enc, long_prompt,
                                       max_embeddings_multiples=3)
    assert emb.shape[1] == 3 * 16  # three bos/eos-wrapped chunks
    # weighting changes the embedding but preserves the mean
    plain = get_weighted_text_embeddings(tok, enc, "a house")
    weighted = get_weighted_text_embeddings(tok, enc, "a (house:1.5)")
    assert not np.allclose(np.asarray(plain), np.asarray(weighted))
    # mean restoration: the rescale holds to fp noise (means are ~0 for a
    # random-init encoder, so compare absolutely at the embedding scale)
    assert abs(float(plain.mean()) - float(weighted.mean())) \
        < 1e-6 * float(np.abs(np.asarray(plain)).mean())


def _sd_parts():
    tok = tiny_tokenizer()
    return dict(vae=tiny_vae(), text_encoder=tiny_text_encoder(tok),
                tokenizer=tok, unet=tiny_unet())


def test_long_prompt_pipeline_runs():
    pipe = StableDiffusionLongPromptPipeline(
        scheduler=DDPMScheduler(), **_sd_parts())
    long_prompt = "a (majestic:1.4) castle " + " ".join(["detail"] * 30)
    img = pipe(long_prompt, height=16, width=16, num_inference_steps=2,
               output_type="np")[0]
    assert img.shape == (1, 16, 16, 3) and np.isfinite(img).all()


def test_hires_fix_pipeline():
    pipe = StableDiffusionHiresFixPipeline(
        scheduler=DDIMScheduler(), **_sd_parts())
    img = pipe("a cat", height=32, width=32, base_size=16,
               num_inference_steps=2, hires_strength=0.5,
               output_type="np")[0]
    assert img.shape == (1, 32, 32, 3) and np.isfinite(img).all()


def test_walk_pipeline_slerp():
    v0 = jnp.asarray([1.0, 0.0])
    v1 = jnp.asarray([0.0, 1.0])
    mid = slerp(0.5, v0, v1)
    np.testing.assert_allclose(np.asarray(mid),
                               [np.sin(np.pi / 4) / np.sin(np.pi / 2)] * 2,
                               rtol=1e-5)
    pipe = StableDiffusionWalkPipeline(scheduler=DDPMScheduler(), **_sd_parts())
    frames = pipe.walk("a dog", "a cat", steps=2, height=16, width=16,
                       num_inference_steps=2, output_type="np")
    assert len(frames) == 2
    assert frames[0].shape == (1, 16, 16, 3)
    assert not np.allclose(frames[0], frames[1])


def test_merge_checkpoints():
    a = {"w": jnp.ones((2, 2)), "b": jnp.zeros(2)}
    b = {"w": jnp.zeros((2, 2)), "b": jnp.ones(2) * 2}
    m = merge_checkpoints([a, b], alpha=0.25)
    np.testing.assert_allclose(np.asarray(m["w"]), 0.75)
    np.testing.assert_allclose(np.asarray(m["b"]), 0.5)
    c = {"w": jnp.ones((2, 2)) * 0.5, "b": jnp.zeros(2)}
    m3 = merge_checkpoints([a, b, c], alpha=1.0, interp="add_difference")
    np.testing.assert_allclose(np.asarray(m3["w"]), 0.5)


def test_clip_guided_pipeline():
    from paddlemix_tpu.models.clip import CLIPConfig, CLIPModel

    tok = tiny_tokenizer()
    clip = CLIPModel.from_config(CLIPConfig.from_dict(dict(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=1, num_attention_heads=2,
                           image_size=16, patch_size=8),
        text_config=dict(vocab_size=tok.vocab_size, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=1,
                         num_attention_heads=2, max_position_embeddings=16,
                         eos_token_id=tok.eos_token_id),
        projection_dim=16)))
    pipe = CLIPGuidedStableDiffusionPipeline(
        scheduler=DDPMScheduler(), **_sd_parts())
    pipe.set_clip(clip, tok)
    img = pipe("a photo of a dog", height=16, width=16,
               num_inference_steps=2, clip_guidance_scale=50.0,
               output_type="np")[0]
    assert img.shape == (1, 16, 16, 3) and np.isfinite(img).all()
    # guidance must actually move the output (same weights, zero scale)
    img0 = pipe("a photo of a dog", height=16, width=16,
                num_inference_steps=2, clip_guidance_scale=0.0,
                output_type="np")[0]
    assert not np.allclose(img, img0)


def test_composable_pipeline():
    from paddlemix_tpu.diffusers.pipelines import (
        ComposableStableDiffusionPipeline,
    )

    pipe = ComposableStableDiffusionPipeline(
        scheduler=DDPMScheduler(), **_sd_parts())
    img = pipe("a red cube | a blue sphere", weights="0.7 | 0.3",
               height=16, width=16, num_inference_steps=2,
               output_type="np")[0]
    assert img.shape == (1, 16, 16, 3) and np.isfinite(img).all()
    # composition differs from the single-prompt result
    one = pipe("a red cube", height=16, width=16, num_inference_steps=2,
               output_type="np")[0]
    assert not np.allclose(img, one)


def test_reference_only_pipeline():
    from paddlemix_tpu.diffusers.pipelines import (
        StableDiffusionReferencePipeline,
    )

    parts = _sd_parts()
    pipe = StableDiffusionReferencePipeline(
        scheduler=DDPMScheduler(), **parts)
    ref_a = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
    ref_b = (np.random.RandomState(9).rand(16, 16, 3) * 255).astype(np.uint8)
    img_a = pipe("a portrait", image=ref_a, height=16, width=16,
                 num_inference_steps=2, output_type="np")[0]
    assert img_a.shape == (1, 16, 16, 3) and np.isfinite(img_a).all()
    # a different reference image must change the generation
    img_b = pipe("a portrait", image=ref_b, height=16, width=16,
                 num_inference_steps=2, output_type="np")[0]
    assert not np.allclose(img_a, img_b)


def test_wildcard_prompting(tmp_path):
    from paddlemix_tpu.diffusers.pipelines import (
        replace_prompt_with_wildcards,
    )

    out = replace_prompt_with_wildcards(
        "a __animal__ in a __place__",
        wildcard_option_dict={"animal": ["cat"], "place": ["forest"]})
    assert out == "a cat in a forest"
    f = tmp_path / "style.txt"
    f.write_text("baroque\n")
    out = replace_prompt_with_wildcards("__style__ art",
                                        wildcard_files=[str(f)])
    assert out == "baroque art"


def test_mega_pipeline_modes():
    from paddlemix_tpu.diffusers.pipelines import StableDiffusionMegaPipeline

    pipe = StableDiffusionMegaPipeline(scheduler=DDPMScheduler(), **_sd_parts())
    t2i = pipe.text2img("a cat", height=16, width=16,
                        num_inference_steps=2, output_type="np")[0]
    assert t2i.shape == (1, 16, 16, 3)
    init = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
    i2i = pipe.img2img("a cat", image=init, strength=0.5,
                       num_inference_steps=2, output_type="np")[0]
    assert i2i.shape == (1, 16, 16, 3) and np.isfinite(i2i).all()


def test_mixture_tiling_pipeline():
    from paddlemix_tpu.diffusers.pipelines import (
        StableDiffusionTilingPipeline,
    )

    pipe = StableDiffusionTilingPipeline(scheduler=DDPMScheduler(),
                                         **_sd_parts())
    img = pipe([["a forest", "a desert"]], tile_height=16, tile_width=16,
               tile_row_overlap=8, tile_col_overlap=8,
               num_inference_steps=2, output_type="np")[0]
    # 1x2 grid of 16px tiles with 8px col overlap -> 16 x 24 canvas
    assert img.shape == (1, 16, 24, 3) and np.isfinite(img).all()


def test_edict_exact_inversion():
    """Same base and target prompt -> the coupled inversion/denoise round
    trip must reconstruct the input latent (EDICT's defining property)."""
    from paddlemix_tpu.diffusers import DDIMScheduler
    from paddlemix_tpu.diffusers.pipelines import EDICTPipeline

    parts = _sd_parts()
    pipe = EDICTPipeline(scheduler=DDIMScheduler(set_alpha_to_one=True),
                         **parts)
    img = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)

    # ground-truth input latent (mode, as the pipeline computes it)
    init = jnp.asarray(pipe.image_processor.preprocess(img))
    lat_in = pipe.vae.encode(init).mode() * pipe.vae.config.scaling_factor

    out = pipe("a photo", "a photo", image=img, num_inference_steps=4,
               strength=1.0, guidance_scale=1.0, output_type="latent")[0]
    err = float(jnp.abs(out - lat_in).max() / (jnp.abs(lat_in).max() + 1e-9))
    assert err < 2e-2, err

    # a different target prompt must move the latent
    out2 = pipe("a photo", "an oil painting of a cat", image=img,
                num_inference_steps=4, strength=1.0, guidance_scale=1.0,
                output_type="latent")[0]
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_fabric_pipeline_feedback():
    from paddlemix_tpu.diffusers.pipelines import FabricPipeline

    pipe = FabricPipeline(scheduler=DDPMScheduler(), **_sd_parts())
    liked = [(np.random.RandomState(1).rand(16, 16, 3) * 255).astype(np.uint8)]
    disliked = [(np.random.RandomState(2).rand(16, 16, 3) * 255).astype(np.uint8)]
    img = pipe("a landscape", liked=liked, disliked=disliked,
               height=16, width=16, num_inference_steps=3,
               feedback_start_ratio=0.0, feedback_end_ratio=1.0,
               output_type="np")[0]
    assert img.shape == (1, 16, 16, 3) and np.isfinite(img).all()
    # no feedback -> plain SD path, and the feedback must matter
    base = pipe("a landscape", height=16, width=16, num_inference_steps=3,
                output_type="np")[0]
    assert not np.allclose(img, base)
    # masked window (start==end) ~ the plain result
    masked = pipe("a landscape", liked=liked, disliked=disliked,
                  height=16, width=16, num_inference_steps=3,
                  feedback_start_ratio=0.5, feedback_end_ratio=0.5,
                  output_type="np")[0]
    np.testing.assert_allclose(masked, base, atol=2e-2)


def test_images_mixing_pipeline():
    from paddlemix_tpu.diffusers.pipelines import (
        CLIPGuidedImagesMixingPipeline,
    )
    from paddlemix_tpu.models.clip import CLIPConfig, CLIPModel

    tok = tiny_tokenizer()
    clip = CLIPModel.from_config(CLIPConfig.from_dict(dict(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=1, num_attention_heads=2,
                           image_size=16, patch_size=8),
        text_config=dict(vocab_size=tok.vocab_size, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=1,
                         num_attention_heads=2, max_position_embeddings=16,
                         eos_token_id=tok.eos_token_id),
        projection_dim=16)))
    pipe = CLIPGuidedImagesMixingPipeline(scheduler=DDPMScheduler(),
                                          **_sd_parts())
    pipe.set_clip(clip, tok)
    content = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
    style = (np.random.RandomState(7).rand(16, 16, 3) * 255).astype(np.uint8)
    img = pipe.images_mixing(content, style, content_prompt="a photo",
                             style_prompt="a painting",
                             num_inference_steps=3, noise_strength=0.7,
                             clip_guidance_scale=20.0, output_type="np")[0]
    assert img.shape == (1, 16, 16, 3) and np.isfinite(img).all()
    # style strength must matter
    img2 = pipe.images_mixing(content, style, content_prompt="a photo",
                              style_prompt="a painting",
                              latent_style_strength=0.1,
                              num_inference_steps=3, noise_strength=0.7,
                              clip_guidance_scale=20.0, output_type="np")[0]
    assert not np.allclose(img, img2)
