"""Appflow: task-level pipelines with chaining.

Rebuild of the reference Appflow (paddlemix/appflow/appflow.py:23-87 Appflow +
task chaining :79-87, apptask.py:84-100 _construct_model/_preprocess/
_run_model/_postprocess, configuration.py:30 APPLICATIONS registry)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from ..utils.log import logger
from ..utils.registry import Registry

APPLICATIONS = Registry("applications")


class AppTask:
    """Base task: construct model lazily, then preprocess/run/postprocess."""

    def __init__(self, task: str, model: Optional[str] = None, **kwargs):
        self.task = task
        self.model = model
        self.kwargs = kwargs
        self._constructed = False

    def _construct(self):
        raise NotImplementedError

    def _preprocess(self, inputs: Dict[str, Any]) -> Dict[str, Any]:
        return inputs

    def _run_model(self, inputs: Dict[str, Any]) -> Dict[str, Any]:
        raise NotImplementedError

    def _postprocess(self, inputs: Dict[str, Any]) -> Dict[str, Any]:
        return inputs

    def __call__(self, inputs: Dict[str, Any]) -> Dict[str, Any]:
        if not self._constructed:
            self._construct()
            self._constructed = True
        return self._postprocess(self._run_model(self._preprocess(inputs)))


def register_task(app: str, *task_names: str):
    def deco(cls):
        APPLICATIONS.add(app, {"task_class": cls, "tasks": list(task_names) or [app]})
        return cls

    return deco


class Appflow:
    """Reference appflow.py:35-87: one app = a chain of AppTasks."""

    def __init__(self, app: str, models: Optional[List[str]] = None, **kwargs):
        if app not in APPLICATIONS:
            raise ValueError(f"unknown app {app!r}; known: {sorted(APPLICATIONS.keys())}")
        entry = APPLICATIONS.get(app)
        task_cls = entry["task_class"]
        models = models or [None]
        if isinstance(task_cls, list):
            self.task_instances = [cls(task=app, model=m, **kwargs)
                                   for cls, m in zip(task_cls, models)]
        else:
            self.task_instances = [task_cls(task=app, model=models[0], **kwargs)]
        self.app = app

    def __call__(self, **inputs) -> Dict[str, Any]:
        results: Dict[str, Any] = dict(inputs)
        for task in self.task_instances:
            results = task(results)
        return results


# ------------------------------------------------------------------ tasks
@register_task("text2image_generation")
class Text2ImageTask(AppTask):
    """Reference appflow/text2image_generation.py:38-49."""

    def _construct(self):
        from ..diffusers import DiffusionPipeline

        if isinstance(self.model, str):
            self.pipe = DiffusionPipeline.from_pretrained(self.model)
        else:
            self.pipe = self.model  # pre-built pipeline object

    def _run_model(self, inputs):
        prompt = inputs.pop("prompt")
        images = self.pipe(prompt, **{k: v for k, v in inputs.items()
                                      if k in ("height", "width", "num_inference_steps",
                                               "guidance_scale", "negative_prompt", "seed")})[0]
        return {"result": images}


@register_task("image2text_generation")
class Image2TextTask(AppTask):
    """VQA/captioning over a VLM (reference appflow/image2text_generation.py)."""

    def _construct(self):
        from .helpers import load_vlm

        self.bundle = load_vlm(self.model) if isinstance(self.model, str) else self.model

    def _run_model(self, inputs):
        out = self.bundle.answer(image=inputs.get("image"), prompt=inputs.get("prompt", ""))
        return {"result": out}


@register_task("zero_shot_classification")
class ZeroShotClassificationTask(AppTask):
    def _construct(self):
        from ..models.clip import CLIPModel
        from ..processors.clip_processing import CLIPProcessor

        if isinstance(self.model, str):
            self.clip = CLIPModel.from_pretrained(self.model)
            self.processor = CLIPProcessor.from_pretrained(self.model)
        else:
            self.clip, self.processor = self.model

    def _run_model(self, inputs):
        import jax.numpy as jnp

        image = inputs["image"]
        candidates = inputs["candidate_labels"]
        enc = self.processor(text=[f"a photo of a {c}" for c in candidates], images=[image])
        img = self.clip.encode_image(jnp.asarray(enc["pixel_values"]))
        txt = self.clip.encode_text(jnp.asarray(enc["input_ids"]))
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        import numpy as np

        scores = np.asarray(img @ txt.T)[0]
        order = np.argsort(-scores)
        return {"result": [{"label": candidates[i], "score": float(scores[i])}
                           for i in order]}


@register_task("openset_det_sam")
class OpenSetDetSamTask(AppTask):
    """Open-set detection + segmentation: GroundingDINO boxes -> SAM masks
    (reference appflow/openset_det_sam.py, the CVinW application)."""

    def _construct(self):
        if isinstance(self.model, (tuple, list)):
            self.det, self.sam = self.model
        else:
            from ..models.groundingdino import GroundingDinoModel
            from ..models.sam import SamModel

            self.det = GroundingDinoModel.from_pretrained(self.kwargs["det_path"])
            self.sam = SamModel.from_pretrained(self.kwargs["sam_path"])

    def _run_model(self, inputs):
        import jax.numpy as jnp
        import numpy as np

        image = np.asarray(inputs["image"], np.float32)
        if image.max() > 1.5:
            image = image / 255.0
        px = jnp.asarray(image)[None]
        if "input_ids" not in inputs and "prompt" in inputs:
            # raw-text path: tokenize through GroundingDinoProcessor
            from ..processors import GroundingDinoTextProcessor
            from ..utils.tokenizer import load_tokenizer

            tok = self.kwargs.get("tokenizer")
            if tok is None and "det_path" in self.kwargs:
                tok = load_tokenizer(self.kwargs["det_path"])
            caption = GroundingDinoTextProcessor.pre_caption(inputs["prompt"])
            inputs = dict(inputs, input_ids=[tok.encode(caption)])
        ids = jnp.asarray(inputs["input_ids"], jnp.int32)
        box_threshold = float(inputs.get("box_threshold", 0.3))
        boxes, scores = self.det.predict(px, ids)
        keep = np.asarray(scores[0]) >= box_threshold
        boxes_np = np.asarray(boxes[0])[keep]  # (N, 4) cxcywh in [0,1]
        masks = []
        for box in boxes_np:
            cx, cy, w, h = box
            corners = jnp.asarray([[[cx - w / 2, cy - h / 2],
                                    [cx + w / 2, cy + h / 2]]])
            m, iou = self.sam(px, boxes=corners)
            best = int(np.argmax(np.asarray(iou[0])))
            masks.append(np.asarray(m[0, best]))
        return {"result": {"boxes": boxes_np,
                           "scores": np.asarray(scores[0])[keep],
                           "masks": np.stack(masks) if masks else np.zeros((0,))}}


@register_task("text2video_generation")
class Text2VideoTask(AppTask):
    """Reference appflow/text2video_generation.py: motion-UNet pipeline."""

    def _construct(self):
        self.pipe = self.model  # TextToVideoPipeline or path

    def _run_model(self, inputs):
        prompt = inputs.pop("prompt")
        frames = self.pipe(prompt, **{k: v for k, v in inputs.items()
                                      if k in ("num_frames", "num_inference_steps",
                                               "guidance_scale", "seed")})[0]
        return {"result": frames}


@register_task("image2image_generation")
class Image2ImageTask(AppTask):
    """Reference appflow/image2image_text_guided_generation.py."""

    def _construct(self):
        self.pipe = self.model

    def _run_model(self, inputs):
        out = self.pipe(inputs.pop("prompt"), image=inputs.pop("image"),
                        **{k: v for k, v in inputs.items()
                           if k in ("strength", "num_inference_steps",
                                    "guidance_scale", "seed")})[0]
        return {"result": out}


@register_task("inpainting")
class InpaintingTask(AppTask):
    """Reference appflow/image_inpainting.py (+ Inpainting application)."""

    def _construct(self):
        self.pipe = self.model

    def _run_model(self, inputs):
        out = self.pipe(inputs.pop("prompt"), image=inputs.pop("image"),
                        mask_image=inputs.pop("mask"),
                        **{k: v for k, v in inputs.items()
                           if k in ("num_inference_steps", "guidance_scale", "seed")})[0]
        return {"result": out}


@register_task("music_generation")
class MusicGenerationTask(AppTask):
    """Reference applications/MusicGeneration (audioldm/musicldm backends)."""

    def _construct(self):
        self.pipe = self.model

    def _run_model(self, inputs):
        audio = self.pipe(inputs.pop("prompt"),
                          **{k: v for k, v in inputs.items()
                             if k in ("audio_length_in_s", "num_inference_steps",
                                      "guidance_scale", "seed")})[0]
        return {"result": audio}


@register_task("automatic_label")
class AutomaticLabelTask(AppTask):
    """Reference appflow/automatic_label.py (+ Automatic_label application):
    caption the image with a VLM, then ground the caption's nouns with
    open-set detection + SAM masks."""

    def _construct(self):
        vlm, det, sam = self.model
        from .helpers import load_vlm

        self.vlm = load_vlm(vlm) if isinstance(vlm, str) else vlm
        self.det_sam = OpenSetDetSamTask(task="openset_det_sam", model=(det, sam))

    def _run_model(self, inputs):
        caption = self.vlm.answer(image=inputs["image"],
                                  prompt=inputs.get("prompt", "describe the image"))
        det_inputs = {"image": inputs["image"],
                      "prompt": inputs.get("labels_prompt", caption)}
        if "input_ids" in inputs:  # pre-tokenized grounding text
            det_inputs["input_ids"] = inputs["input_ids"]
        if "box_threshold" in inputs:
            det_inputs["box_threshold"] = inputs["box_threshold"]
        det_out = self.det_sam(det_inputs)  # __call__ constructs lazily
        return {"result": {"caption": caption, **det_out["result"]}
                if isinstance(det_out.get("result"), dict)
                else {"caption": caption, "detection": det_out.get("result")}}


@register_task("image_variation")
class ImageVariationTask(AppTask):
    """Reference appflow image variation (VersatileDiffusion / SD-imvar)."""

    def _construct(self):
        self.pipe = self.model

    def _run_model(self, inputs):
        out = self.pipe(inputs.pop("image"),
                        **{k: v for k, v in inputs.items()
                           if k in ("height", "width", "num_inference_steps",
                                    "guidance_scale", "seed")})[0]
        return {"result": out}


@register_task("instruct_edit")
class InstructEditTask(AppTask):
    """Instruction-based editing (InstructPix2Pix backend)."""

    def _construct(self):
        self.pipe = self.model

    def _run_model(self, inputs):
        out = self.pipe(inputs.pop("prompt"), image=inputs.pop("image"),
                        **{k: v for k, v in inputs.items()
                           if k in ("num_inference_steps", "guidance_scale",
                                    "image_guidance_scale", "seed")})[0]
        return {"result": out}


@register_task("image_super_resolution")
class SuperResolutionTask(AppTask):
    """x4 upscaling (StableDiffusionUpscale / LDM-SR backends)."""

    def _construct(self):
        self.pipe = self.model

    def _run_model(self, inputs):
        args = [inputs.pop("prompt")] if "prompt" in inputs else []
        out = self.pipe(*args, image=inputs.pop("image"),
                        **{k: v for k, v in inputs.items()
                           if k in ("num_inference_steps", "guidance_scale",
                                    "noise_level", "seed")})[0]
        return {"result": out}


@register_task("video2video_generation")
class Video2VideoTask(AppTask):
    """Text-guided clip editing (VideoToVideoPipeline backend)."""

    def _construct(self):
        self.pipe = self.model

    def _run_model(self, inputs):
        out = self.pipe(inputs.pop("prompt"), video=inputs.pop("video"),
                        **{k: v for k, v in inputs.items()
                           if k in ("strength", "num_inference_steps",
                                    "guidance_scale", "seed")})[0]
        return {"result": out}


@register_task("audio_generation")
class AudioGenerationTask(AppTask):
    """Unconditional audio (AudioDiffusion backend) or text-to-audio
    (AudioLDM) depending on the bound pipeline."""

    def _construct(self):
        self.pipe = self.model

    def _run_model(self, inputs):
        if "prompt" in inputs:
            out = self.pipe(inputs.pop("prompt"),
                            **{k: v for k, v in inputs.items()
                               if k in ("num_inference_steps", "seed")})
        else:
            out = self.pipe(**{k: v for k, v in inputs.items()
                               if k in ("num_inference_steps", "seed",
                                        "batch_size")})
        return {"result": out[-1] if isinstance(out, tuple) and len(out) > 1
                else out[0]}


@register_task("clip_interrogate")
class ClipInterrogateTask(AppTask):
    """Image -> generation-ready prompt (reference
    ppdiffusers/examples/clip_interrogator). model = (clip_model,
    clip_processor) or an Interrogator; optional caption_fn kwarg."""

    def _construct(self):
        from .clip_interrogator import Interrogator

        if isinstance(self.model, Interrogator):
            self.interrogator = self.model
        else:
            clip_model, processor = self.model
            self.interrogator = Interrogator(
                clip_model, processor,
                caption_fn=self.kwargs.get("caption_fn"),
                data_path=self.kwargs.get("data_path"))

    def _run_model(self, inputs):
        mode = inputs.get("mode", "fast")
        fn = (self.interrogator.interrogate_classic if mode == "classic"
              else self.interrogator.interrogate_fast)
        return {"result": fn(inputs["image"],
                             max_flavors=inputs.get("max_flavors", 3))}


# ------------------------------------------------------------ audio stack
@register_task("audio_asr")
class AudioASRTask(AppTask):
    """Speech -> text via the native Whisper (reference appflow/audio_asr.py
    delegates to a paddlespeech conformer executor; here the ASR model is
    in-framework). model = WhisperForConditionalGeneration or a checkpoint
    path; kwargs: processor (wav -> log-mel, default WhisperProcessor),
    tokenizer (ids -> str). inputs: audio (waveform), sampling_rate,
    optional prompt template with "{}" (reference audio_asr.py:56-58)."""

    def _construct(self):
        from ..models.whisper import WhisperForConditionalGeneration
        from ..processors.whisper_processing import WhisperProcessor

        self.asr = (WhisperForConditionalGeneration.from_pretrained(self.model)
                    if isinstance(self.model, str) else self.model)
        self.processor = self.kwargs.get("processor") or WhisperProcessor()
        self.tokenizer = self.kwargs.get("tokenizer")
        if self.tokenizer is None and isinstance(self.model, str):
            import os

            if os.path.exists(os.path.join(self.model, "tokenizer.json")):
                from ..utils.tokenizer import HFTokenizer

                hf = HFTokenizer.from_pretrained(self.model)
                self.tokenizer = lambda ids: hf.decode(ids)

    def _run_model(self, inputs):
        import jax.numpy as jnp
        import numpy as np

        feats = self.processor(inputs["audio"], inputs.get("sampling_rate"))
        ids = np.asarray(self.asr.generate(
            jnp.asarray(feats)[None],
            max_new_tokens=inputs.get("max_new_tokens", 64),
            forced_decoder_ids=tuple(inputs.get("forced_decoder_ids", ()))))[0]
        text = self.tokenizer(ids) if self.tokenizer is not None else ids
        out = dict(inputs)
        out["asr_result"] = text
        if isinstance(text, str) and isinstance(inputs.get("prompt"), str) \
                and "{}" in inputs["prompt"]:
            out["prompt"] = inputs["prompt"].format(text)
        out.setdefault("result", text)
        return out


@register_task("text_generation")
class TextGenerationTask(AppTask):
    """Prompt -> text. model = a callable (prompt -> str), or an
    (lm, tokenizer) pair where lm has .generate over token ids (the
    reference slot is ChatGlmTask, appflow/text2text_generation.py)."""

    def _construct(self):
        if callable(self.model) and not isinstance(self.model, tuple):
            self.llm, self.tokenizer = self.model, None
        else:
            self.llm, self.tokenizer = self.model

    def _run_model(self, inputs):
        prompt = inputs.get("prompt", "")
        if self.tokenizer is None:
            text = self.llm(prompt)
        else:
            import jax.numpy as jnp
            import numpy as np

            ids = jnp.asarray([self.tokenizer.encode(prompt)], jnp.int32)
            n = inputs.get("max_new_tokens", 64)
            if hasattr(self.llm, "generate"):
                out = self.llm.generate(ids, max_new_tokens=n)
            else:  # causal LMs expose the jitted free-function decode
                from ..models.llama.modeling import greedy_generate

                out = greedy_generate(self.llm, ids, max_new_tokens=n)
            text = self.tokenizer.decode(np.asarray(out)[0])
        out_d = dict(inputs)
        out_d["prompt"] = text      # feeds a downstream TTS stage
        out_d["result"] = text
        return out_d


@register_task("text_to_speech")
class TextToSpeechTask(AppTask):
    """Text -> waveform via the native FastSpeech2 + Griffin-Lim (reference
    appflow/text2speech_synthesize.py runs paddlespeech fastspeech2_csmsc +
    pwgan). model = FastSpeech2Model or a checkpoint path; kwargs:
    phoneme_fn (text -> id list, default: bytes mod vocab), mel_fb
    (filterbank for Griffin-Lim, default slaney 80-mel @ 1024-fft)."""

    def _construct(self):
        from ..models.fastspeech2 import FastSpeech2Model

        self.tts = (FastSpeech2Model.from_pretrained(self.model)
                    if isinstance(self.model, str) else self.model)
        self.phoneme_fn = self.kwargs.get("phoneme_fn")
        self.mel_fb = self.kwargs.get("mel_fb")

    def _run_model(self, inputs):
        import jax.numpy as jnp
        import numpy as np

        from ..models.fastspeech2 import griffin_lim
        from ..processors.whisper_processing import slaney_mel_filterbank

        text = inputs.get("prompt") or inputs.get("text", "")
        if self.phoneme_fn is not None:
            ids = list(self.phoneme_fn(text))
        else:  # byte-level fallback "phonemizer"
            v = self.tts.config.vocab_size
            ids = [1 + (b % (v - 1)) for b in text.encode()][:64] or [1]
        mel, mask = self.tts.synthesize(jnp.asarray([ids], jnp.int32))
        n = int(np.asarray(mask[0]).sum())
        mel_np = np.asarray(mel[0, : max(n, 1)], np.float64)
        fb = (self.mel_fb if self.mel_fb is not None else
              slaney_mel_filterbank(513, self.tts.config.num_mels, 16000))
        wav = griffin_lim(mel_np, fb, n_fft=1024, hop=256,
                          n_iter=inputs.get("griffin_lim_iters", 16))
        out = dict(inputs)
        out["result"] = wav
        out["sampling_rate"] = 16000
        return out


# chained apps (reference configuration.py:176-218: audio2caption =
# asr + chatglm; audio_chat = asr + chatglm + tts)
APPLICATIONS.add("audio2caption", {
    "task_class": [AudioASRTask, TextGenerationTask],
    "tasks": ["audio2caption"]})
APPLICATIONS.add("audio_chat", {
    "task_class": [AudioASRTask, TextGenerationTask, TextToSpeechTask],
    "tasks": ["audio_chat"]})
