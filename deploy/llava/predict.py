"""LLaVA static predictor.

TPU counterpart of the reference's deploy/llava/run_static_predict.py: the
serving process loads the AOT-exported prefill/decode computations plus the
weights and runs the generation loop WITHOUT ever tracing. The decode step
is re-invoked host-side; each call is one cached-token step.

Usage:
  python deploy/llava/predict.py --export-dir ./llava_export \
      --image img.jpg --prompt "describe the image" --max-new-tokens 64
  # tokenizer-free (tests / raw serving): --ids "1,5,9"
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--export-dir", required=True)
    ap.add_argument("--image", default=None)
    ap.add_argument("--prompt", default=None)
    ap.add_argument("--ids", default=None,
                    help="comma-separated token ids (skips the tokenizer)")
    ap.add_argument("--tokenizer", default=None,
                    help="tokenizer dir (defaults to --export-dir)")
    ap.add_argument("--max-new-tokens", type=int, default=32)
    ap.add_argument("--eos", type=int, default=2)
    args = ap.parse_args()

    import jax.numpy as jnp

    from paddlemix_tpu.deploy import load_fn
    from paddlemix_tpu.models.llava import LlavaForConditionalGeneration

    model = LlavaForConditionalGeneration.from_pretrained(args.export_dir)
    prefill = load_fn(os.path.join(args.export_dir, "prefill.jaxexport"))
    decode = load_fn(os.path.join(args.export_dir, "decode.jaxexport"))

    cfg = model.config
    v = cfg.vision
    n_img = cfg.num_image_tokens

    if args.ids:
        text_ids = [int(t) for t in args.ids.split(",")]
    else:
        from paddlemix_tpu.utils.tokenizer import load_tokenizer

        tok = load_tokenizer(args.tokenizer or args.export_dir)
        text_ids = tok.encode(args.prompt or "describe the image")

    if args.image:
        from PIL import Image

        img = np.asarray(Image.open(args.image).convert("RGB"),
                         np.float32) / 255.0
        ih = v.image_size
        import jax

        px = jax.image.resize(jnp.asarray(img)[None], (1, ih, ih, 3),
                              method="bilinear").astype(jnp.float32)
        ids = [text_ids[0] if text_ids else 1] + \
            [cfg.image_token_index] * n_img + text_ids[1:]
    else:
        px = jnp.zeros((1, v.image_size, v.image_size, 3), jnp.float32)
        ids = list(text_ids)

    # pad the prompt to the exported static length
    from paddlemix_tpu.models.llama.modeling import KVCache

    # exported shapes are burned into the serialized computation; recover the
    # prompt bucket from the model dir's export_meta if present, else assume
    # the exporter default used at export time
    s = int(os.environ.get("LLAVA_PROMPT_LEN", max(128, len(ids))))
    if len(ids) > s:
        ids = ids[:s]
    pos = np.full((1, s), -1, np.int32)
    pos[0, :len(ids)] = np.arange(len(ids))
    padded = np.zeros((1, s), np.int32)
    padded[0, :len(ids)] = ids

    cache = model.init_cache(1, int(os.environ.get("LLAVA_MAX_LEN", 2048)))
    logits, ck, cv, lengths = prefill(model.params, jnp.asarray(padded), px,
                                      jnp.asarray(pos), cache.k, cache.v,
                                      cache.lengths)
    cur = int(np.argmax(np.asarray(logits)[0, len(ids) - 1]))
    out_tokens = [cur]
    pos_next = len(ids)
    for _ in range(args.max_new_tokens - 1):
        if cur == args.eos:
            break
        logits, ck, cv, lengths = decode(
            model.params, jnp.asarray([[cur]], jnp.int32),
            jnp.asarray([[pos_next]], jnp.int32), ck, cv, lengths)
        cur = int(np.argmax(np.asarray(logits)[0, -1]))
        out_tokens.append(cur)
        pos_next += 1

    print("tokens:", out_tokens)
    if not args.ids:
        try:
            print("text:", tok.decode(out_tokens))
        except Exception:
            pass


if __name__ == "__main__":
    main()
