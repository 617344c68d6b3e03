"""Core substrate tests: config round-trip, model save/load, sharding rules.

Modeled on the reference's common-test strategy
(tests/models/test_modeling_common.py:74-120: tiny configs, save→reload→
max-diff bounded)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from paddlemix_tpu.core.config import BaseConfig
from paddlemix_tpu.core.modeling import PretrainedModel, flatten_params
from paddlemix_tpu.parallel.mesh import MeshConfig, create_mesh
from paddlemix_tpu.parallel.sharding import TRANSFORMER_RULES, make_shardings, shard_params


@dataclasses.dataclass
class TinyConfig(BaseConfig):
    model_type = "tiny"
    hidden_size: int = 16
    num_layers: int = 2


class TinyModule(nn.Module):
    config: TinyConfig

    @nn.compact
    def __call__(self, x):
        for i in range(self.config.num_layers):
            x = nn.Dense(self.config.hidden_size, name=f"layers_{i}")(x)
            x = nn.gelu(x)
        return nn.Dense(self.config.hidden_size, name="final")(x)


class TinyModel(PretrainedModel):
    config_class = TinyConfig
    module_class = TinyModule

    @classmethod
    def example_inputs(cls, config):
        return (jnp.zeros((1, config.hidden_size)),), {}


def test_config_roundtrip(tmp_path):
    cfg = TinyConfig(hidden_size=32, num_layers=3)
    cfg.save_pretrained(str(tmp_path))
    cfg2 = TinyConfig.from_pretrained(str(tmp_path))
    assert cfg2.hidden_size == 32 and cfg2.num_layers == 3
    # unknown keys from foreign configs survive in unused_kwargs
    cfg3 = TinyConfig.from_dict({"hidden_size": 8, "mystery": True})
    assert cfg3.hidden_size == 8 and cfg3.unused_kwargs == {"mystery": True}


def test_model_save_load_roundtrip(tmp_path):
    model = TinyModel.from_config(TinyConfig(), seed=0)
    x = jnp.ones((2, 16))
    y0 = model(x)
    model.save_pretrained(str(tmp_path))
    assert os.path.exists(tmp_path / "model.safetensors")
    model2 = TinyModel.from_pretrained(str(tmp_path))
    y1 = model2(x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)


def test_model_sharded_save(tmp_path):
    model = TinyModel.from_config(TinyConfig(hidden_size=64), seed=0)
    model.save_pretrained(str(tmp_path), max_shard_bytes=8 * 1024)
    assert os.path.exists(tmp_path / "model.safetensors.index.json")
    model2 = TinyModel.from_pretrained(str(tmp_path))
    x = jnp.ones((1, 64))
    np.testing.assert_allclose(np.asarray(model(x)), np.asarray(model2(x)), atol=1e-5)


def test_bf16_cast():
    model = TinyModel.from_config(TinyConfig(), dtype=jnp.bfloat16)
    leaves = jax.tree_util.tree_leaves(model.params)
    assert all(l.dtype == jnp.bfloat16 for l in leaves)


def test_mesh_degrees():
    assert MeshConfig(-1, 2, 2, 1).degrees(8) == (1, 2, 2, 2, 1, 1)
    assert MeshConfig(8, 1, 1, 1).degrees(8) == (1, 8, 1, 1, 1, 1)
    assert MeshConfig(2, 1, 1, 1, 2, 2).degrees(8) == (2, 2, 1, 1, 1, 2)
    with pytest.raises(ValueError):
        MeshConfig(3, 1, 1, 1).degrees(8)


def test_mesh_creation_8dev(mesh8):
    assert dict(mesh8.shape) == {"stage": 1, "data": 2, "fsdp": 2, "tensor": 2, "sequence": 1, "expert": 1}


def test_sharding_rules(mesh8):
    model = TinyModel.from_config(TinyConfig(hidden_size=16))
    sharded = shard_params(model.params, mesh8)
    # kernels (16,16): fsdp axis of size 2 divides 16 -> sharded on dim 1
    shardings = make_shardings(model.params, mesh8)
    flat = flatten_params(shardings)
    spec = flat["final.kernel"].spec
    assert spec == jax.sharding.PartitionSpec(None, "fsdp")
    # biases stay replicated
    assert flat["final.bias"].spec == jax.sharding.PartitionSpec()
    # computation still correct on sharded params
    x = jnp.ones((2, 16))
    y_ref = model(x)
    y_sharded = model.apply(sharded, x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_sharded), atol=1e-5)


def test_pos_embed_interpolation(tmp_path):
    """Loading a checkpoint trained at a different resolution interpolates the
    position table (reference checkpoint.py:182-205)."""
    from paddlemix_tpu.models.clip import CLIPTextModel  # noqa: F401  (import check)
    from paddlemix_tpu.models.clip import CLIPConfig, CLIPModel

    small = CLIPModel.from_config(CLIPConfig.from_dict(dict(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                           num_attention_heads=2, image_size=32, patch_size=16),
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         max_position_embeddings=8, eos_token_id=63),
        projection_dim=16)))
    small.save_pretrained(str(tmp_path))
    # load at doubled image resolution: 2x2+1 -> 4x4+1 positions
    big = CLIPModel.from_pretrained(
        str(tmp_path),
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                           num_attention_heads=2, image_size=64, patch_size=16))
    import jax.numpy as jnp

    px = jnp.ones((1, 64, 64, 3))
    ids = jnp.full((1, 8), 5, jnp.int32).at[:, -1].set(63)
    img, txt, _ = big(px, ids)
    assert img.shape == (1, 16)
    assert bool(jnp.all(jnp.isfinite(img)))
