"""DiffusionPipeline base: component registry + model_index.json IO.

Rebuild of the reference's pipeline core
(ppdiffusers/ppdiffusers/pipelines/pipeline_utils.py: register_modules :446,
save_pretrained :508, from_pretrained :783 with per-component load_sub_model
:307). Differences by design: components are jax models/pure schedulers; the
denoise loop of each concrete pipeline compiles to one jitted
lax.fori_loop instead of a python loop over scheduler.step."""

from __future__ import annotations

import importlib
import inspect
import json
import os
from typing import Any, Dict, Optional, Type

import jax.numpy as jnp

from ...utils.hub import resolve_file
from ...utils.log import logger
from ...utils.registry import Registry

PIPELINE_REGISTRY = Registry("pipelines")

MODEL_INDEX_NAME = "model_index.json"

# maps class names appearing in model_index.json to our implementations
_COMPONENT_CLASSES: Dict[str, str] = {
    "CLIPTextModel": "paddlemix_tpu.models.clip:CLIPTextModel",
    "CLIPTextModelWithProjection": "paddlemix_tpu.models.clip:CLIPTextModelWithProjection",
    "CLIPTokenizer": "paddlemix_tpu.models.clip:CLIPTokenizer",
    "AutoencoderKL": "paddlemix_tpu.diffusers.models:AutoencoderKL",
    "UNet2DConditionModel": "paddlemix_tpu.diffusers.models:UNet2DConditionModel",
    "DDIMScheduler": "paddlemix_tpu.diffusers.schedulers:DDIMScheduler",
    "DDPMScheduler": "paddlemix_tpu.diffusers.schedulers:DDPMScheduler",
    "PNDMScheduler": "paddlemix_tpu.diffusers.schedulers:PNDMScheduler",
    "DPMSolverMultistepScheduler": "paddlemix_tpu.diffusers.schedulers:DPMSolverMultistepScheduler",
    "EulerDiscreteScheduler": "paddlemix_tpu.diffusers.schedulers:EulerDiscreteScheduler",
    "EulerAncestralDiscreteScheduler": "paddlemix_tpu.diffusers.schedulers:EulerAncestralDiscreteScheduler",
    "FlowMatchEulerDiscreteScheduler": "paddlemix_tpu.diffusers.schedulers:FlowMatchEulerDiscreteScheduler",
    "LCMScheduler": "paddlemix_tpu.diffusers.schedulers:LCMScheduler",
    "UniPCMultistepScheduler": "paddlemix_tpu.diffusers.schedulers:UniPCMultistepScheduler",
    "HeunDiscreteScheduler": "paddlemix_tpu.diffusers.schedulers:HeunDiscreteScheduler",
    "ControlNetModel": "paddlemix_tpu.diffusers.models:ControlNetModel",
    "SD3Transformer2DModel": "paddlemix_tpu.diffusers.models:SD3Transformer2DModel",
    "DiTModel": "paddlemix_tpu.diffusers.models:DiTModel",
    "Transformer2DModel": "paddlemix_tpu.diffusers.models:DiTModel",
    "T5EncoderModel": "paddlemix_tpu.models.t5:T5EncoderModel",
    "CLIPImageProcessor": "paddlemix_tpu.processors.clip_processing:CLIPImageProcessor",
    # round-2 additions
    "UNetMotionModel": "paddlemix_tpu.diffusers.models:UNetMotionModel",
    "UNetSpatioTemporalConditionModel":
        "paddlemix_tpu.diffusers.models:UNetSpatioTemporalConditionModel",
    "AutoencoderKLTemporalDecoder":
        "paddlemix_tpu.diffusers.models:AutoencoderKLTemporalDecoder",
    "T2IAdapter": "paddlemix_tpu.diffusers.models:T2IAdapter",
    "PriorTransformer": "paddlemix_tpu.diffusers.models:PriorTransformer",
    "VQModel": "paddlemix_tpu.diffusers.models:VQModel",
    "RobertaSeriesModelWithTransformation":
        "paddlemix_tpu.models.bert:RobertaSeriesModelWithTransformation",
    "XLMRobertaModel": "paddlemix_tpu.models.bert:XLMRobertaModel",
    "BertModel": "paddlemix_tpu.models.bert:BertModel",
    "KDPM2DiscreteScheduler":
        "paddlemix_tpu.diffusers.schedulers:KDPM2DiscreteScheduler",
    "KDPM2AncestralDiscreteScheduler":
        "paddlemix_tpu.diffusers.schedulers:KDPM2AncestralDiscreteScheduler",
    "LMSDiscreteScheduler":
        "paddlemix_tpu.diffusers.schedulers:LMSDiscreteScheduler",
    "DPMSolverSinglestepScheduler":
        "paddlemix_tpu.diffusers.schedulers:DPMSolverSinglestepScheduler",
    "DEISMultistepScheduler":
        "paddlemix_tpu.diffusers.schedulers:DEISMultistepScheduler",
    "DPMSolverSDEScheduler":
        "paddlemix_tpu.diffusers.schedulers:DPMSolverSDEScheduler",
    "EDMEulerScheduler": "paddlemix_tpu.diffusers.schedulers:EDMEulerScheduler",
    "EDMDPMSolverMultistepScheduler":
        "paddlemix_tpu.diffusers.schedulers:EDMDPMSolverMultistepScheduler",
    "IPNDMScheduler": "paddlemix_tpu.diffusers.schedulers:IPNDMScheduler",
    "DDIMInverseScheduler":
        "paddlemix_tpu.diffusers.schedulers:DDIMInverseScheduler",
    "RePaintScheduler": "paddlemix_tpu.diffusers.schedulers:RePaintScheduler",
    "UnCLIPScheduler": "paddlemix_tpu.diffusers.schedulers:UnCLIPScheduler",
    "CMStochasticIterativeScheduler":
        "paddlemix_tpu.diffusers.schedulers:CMStochasticIterativeScheduler",
    # round-5 VAE variants (reference autoencoder family)
    "AutoencoderTiny": "paddlemix_tpu.diffusers.models:AutoencoderTiny",
    "AsymmetricAutoencoderKL":
        "paddlemix_tpu.diffusers.models:AsymmetricAutoencoderKL",
    "ConsistencyDecoderVAE":
        "paddlemix_tpu.diffusers.models:ConsistencyDecoderVAE",
}


def resolve_component_class(class_name: str) -> Optional[type]:
    spec = _COMPONENT_CLASSES.get(class_name)
    if spec is None:
        return None
    mod, _, attr = spec.partition(":")
    try:
        return getattr(importlib.import_module(mod), attr)
    except (ImportError, AttributeError):
        return None


def make_scheduler_state(scheduler, num_inference_steps, sample_shape=None,
                         **kwargs):
    """set_timesteps that forwards sample_shape only to schedulers carrying
    per-sample history (DPM-solver family); jit/fori_loop carries need the
    history buffers shaped like the latents."""
    import inspect

    sig = inspect.signature(scheduler.set_timesteps)
    if sample_shape is not None and "sample_shape" in sig.parameters:
        return scheduler.set_timesteps(num_inference_steps,
                                       sample_shape=sample_shape, **kwargs)
    return scheduler.set_timesteps(num_inference_steps, **kwargs)


class DiffusionPipeline:
    """Component container. Subclasses declare components via __init__ args."""

    _optional_components = ("safety_checker", "feature_extractor", "image_encoder")

    def register_modules(self, **components):
        for name, module in components.items():
            setattr(self, name, module)
        self._components = dict(components)

    @property
    def components(self) -> Dict[str, Any]:
        return dict(self._components)

    def save_pretrained(self, save_directory: str):
        os.makedirs(save_directory, exist_ok=True)
        index = {"_class_name": type(self).__name__}
        for name, comp in self._components.items():
            if comp is None:
                index[name] = (None, None)
                continue
            index[name] = ("paddlemix_tpu", type(comp).__name__)
            if hasattr(comp, "save_pretrained"):
                comp.save_pretrained(os.path.join(save_directory, name))
        with open(os.path.join(save_directory, MODEL_INDEX_NAME), "w") as f:
            json.dump(index, f, indent=2)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.float32, **overrides):
        index_path = resolve_file(path, MODEL_INDEX_NAME)
        with open(index_path) as f:
            index = json.load(f)
        root = os.path.dirname(index_path)

        pipe_cls = cls
        if cls is DiffusionPipeline:
            name = index.get("_class_name", "")
            if name in PIPELINE_REGISTRY:
                pipe_cls = PIPELINE_REGISTRY.get(name)
            else:
                raise ValueError(f"unknown pipeline class {name!r}")

        sig = inspect.signature(pipe_cls.__init__)
        wanted = [p for p in sig.parameters if p != "self"]
        components: Dict[str, Any] = {}
        for name, entry in index.items():
            if name.startswith("_") or name not in wanted:
                continue
            if name in overrides:
                components[name] = overrides.pop(name)
                continue
            if not isinstance(entry, (list, tuple)) or entry[1] is None:
                components[name] = None
                continue
            comp_cls = resolve_component_class(entry[1])
            if comp_cls is None:
                if name in cls._optional_components or name not in wanted:
                    logger.warning("skipping unsupported component %s (%s)", name, entry[1])
                    components[name] = None
                    continue
                raise ValueError(f"no implementation for component {name} ({entry[1]})")
            sub = os.path.join(root, name)
            if hasattr(comp_cls, "from_pretrained"):
                try:
                    kwargs = {"dtype": dtype} if "dtype" in inspect.signature(
                        comp_cls.from_pretrained).parameters else {}
                    components[name] = comp_cls.from_pretrained(sub, **kwargs)
                except FileNotFoundError:
                    logger.warning("component dir missing for %s; set to None", name)
                    components[name] = None
            else:
                components[name] = None
        for name in wanted:
            components.setdefault(name, overrides.pop(name, None))
        return pipe_cls(**components)


def register_pipeline(cls: Type) -> Type:
    PIPELINE_REGISTRY.add(cls.__name__, cls)
    return cls
