"""Pallas VMEM-resident attention vs the einsum path (interpret mode on CPU;
validated + benchmarked on real TPU — see PERF.md)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from cgd_tpu.kernels.attention_pallas import flash_mha
from cgd_tpu.ops.nn import qkv_attention


def ref(q, k, v):
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(math.sqrt(d))
    s = jnp.einsum("ntd,nsd->nts", q * scale, k * scale)
    p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("nts,nsd->ntd", p, v)


class TestFlashMHA:
    def test_forward_matches(self):
        q, k, v = (
            jax.random.normal(jax.random.PRNGKey(i), (4, 64, 16)) for i in range(3)
        )
        out = flash_mha(q, k, v, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref(q, k, v)), atol=1e-5)

    def test_gradients_match(self):
        q, k, v = (
            jax.random.normal(jax.random.PRNGKey(i), (2, 32, 8)) for i in range(3)
        )
        ga = jax.grad(lambda q, k, v: flash_mha(q, k, v, True).sum(), argnums=(0, 1, 2))(q, k, v)
        gb = jax.grad(lambda q, k, v: ref(q, k, v).sum(), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_env_flag_path(self, monkeypatch):
        monkeypatch.setenv("CGD_TPU_PALLAS_ATTN", "1")
        qkv = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 3 * 32))
        out_pallas = qkv_attention(qkv, num_heads=2)
        monkeypatch.delenv("CGD_TPU_PALLAS_ATTN")
        out_ref = qkv_attention(qkv, num_heads=2)
        np.testing.assert_allclose(
            np.asarray(out_pallas), np.asarray(out_ref), atol=1e-5
        )
