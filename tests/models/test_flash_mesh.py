"""shard_map flash attention under a (data, model) mesh.

The stock TPU kernel has no interpret mode, so the innermost dispatch
(`layers._flash_kernel_call`) is monkeypatched with a traceable jnp oracle
implementing the kernel's exact contract (segment-id masking, sm_scale,
causal). The tests then validate everything the mesh path owns — partition
specs, per-shard GQA repeat, shard-local pad/transpose glue, trainer
plumbing — by comparing against the einsum attention path on the hermetic
8-virtual-device mesh (reference has no distributed tests at all;
SURVEY.md §2.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import colpali_tpu.models.layers as layers_mod
from colpali_tpu.models.layers import Attention, flash_mesh
from colpali_tpu.parallel.sharding import make_mesh


def _jnp_oracle_kernel(qt, kt, vt, seg, scale, causal, sizes):
    """Traceable stand-in with SegmentIds semantics (works under shard_map)."""
    f32 = jnp.float32
    logits = jnp.einsum("bhqd,bhkd->bhqk", qt.astype(f32), kt.astype(f32)) * scale
    same = seg[:, None, :, None] == seg[:, None, None, :]
    if causal:
        s = qt.shape[2]
        qi = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        same = jnp.logical_and(same, (ki <= qi)[None, None])
    logits = jnp.where(same, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, vt.astype(f32)).astype(qt.dtype)


@pytest.fixture()
def oracle_kernel(monkeypatch):
    monkeypatch.setattr(layers_mod, "_flash_kernel_call", _jnp_oracle_kernel)


def _make_attn(use_flash, **kw):
    return Attention(num_heads=8, head_dim=16, num_kv_heads=4,
                     dtype=jnp.bfloat16, param_dtype=jnp.float32,
                     use_flash=use_flash, **kw)


def _inputs(seed=0, b=8, s=192, model_dim=128):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, s, model_dim)), jnp.bfloat16)
    # right-padding per row (flash pads ride segment 0; rows compared are valid)
    lens = rng.integers(s // 2, s + 1, size=b)
    mask = jnp.asarray(np.arange(s)[None, :] < lens[:, None], jnp.int32)
    return x, mask, lens


class TestFlashMesh:
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_einsum_path_on_mesh(self, oracle_kernel, causal):
        mesh = make_mesh(data=4, model=2)
        x, mask, lens = _inputs()
        ref = _make_attn(use_flash=False)
        params = ref.init(jax.random.PRNGKey(0), x, mask=mask, causal=causal)
        expected = np.asarray(ref.apply(params, x, mask=mask, causal=causal), np.float32)

        flash = _make_attn(use_flash=True)
        with flash_mesh(mesh):
            got = np.asarray(flash.apply(params, x, mask=mask, causal=causal), np.float32)

        for i, n in enumerate(lens):  # pad rows are garbage by contract
            np.testing.assert_allclose(got[i, :n], expected[i, :n], atol=5e-2, rtol=5e-2)

    def test_windowed_segments_on_mesh(self, oracle_kernel):
        """Qwen2.5-style windowed attention: segment ids through shard_map."""
        mesh = make_mesh(data=4, model=2)
        x, _, _ = _inputs(seed=1)
        b, s, _ = x.shape
        segments = jnp.asarray(np.arange(s) // 64, jnp.int32)[None, :].repeat(b, axis=0)

        ref = _make_attn(use_flash=False)
        params = ref.init(jax.random.PRNGKey(0), x, segments=segments)
        expected = np.asarray(ref.apply(params, x, segments=segments), np.float32)

        flash = _make_attn(use_flash=True)
        with flash_mesh(mesh):
            got = np.asarray(flash.apply(params, x, segments=segments), np.float32)
        np.testing.assert_allclose(got, expected, atol=5e-2, rtol=5e-2)

    def test_grad_flows_through_mesh_flash(self, oracle_kernel):
        """The sharded trainer differentiates through the shard_map kernel."""
        mesh = make_mesh(data=4, model=2)
        x, mask, _ = _inputs(seed=2, s=128)
        flash = _make_attn(use_flash=True)
        ref = _make_attn(use_flash=False)
        params = ref.init(jax.random.PRNGKey(0), x, mask=mask)

        def loss(p, mod):
            out = mod.apply(p, x, mask=mask).astype(jnp.float32)
            # pad rows are garbage BY CONTRACT on the flash path — exclude
            # them from the loss so both paths differentiate the same fn
            return jnp.sum((out * mask[..., None]) ** 2)

        with flash_mesh(mesh):
            g_flash = jax.grad(lambda p: loss(p, flash))(params)
        g_ref = jax.grad(lambda p: loss(p, ref))(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=0.5, rtol=0.2),
            g_flash, g_ref)

    def test_indivisible_forced_raises(self, oracle_kernel):
        mesh = make_mesh(data=4, model=2)
        x, mask, _ = _inputs(s=128)
        attn = Attention(num_heads=6, head_dim=16, num_kv_heads=3,  # kv 3 % model 2 != 0
                         dtype=jnp.bfloat16, param_dtype=jnp.float32, use_flash=True)
        params = attn.init(jax.random.PRNGKey(0), x, mask=mask)  # no ctx -> padded path
        with flash_mesh(mesh), pytest.raises(ValueError, match="flash_mesh axes"):
            attn.apply(params, x, mask=mask)


class TestFlashMeshEligibility:
    def test_divisibility(self):
        ctx = (make_mesh(data=4, model=2), "data", "model")
        ok = layers_mod._flash_mesh_ok
        assert ok(ctx, 8, 8, 4, require_tpu=False)
        assert not ok(ctx, 6, 8, 4, require_tpu=False)   # batch % data
        assert not ok(ctx, 8, 7, 4, require_tpu=False)   # heads % model
        assert not ok(ctx, 8, 8, 3, require_tpu=False)   # kv heads % model
        # auto path rejects the CPU test mesh (kernel has no interpret mode)
        assert not ok(ctx, 8, 8, 4)

    def test_missing_axes_treated_as_one(self):
        mesh = make_mesh(data=8, model=1)
        ctx = (mesh, "data", "nonexistent")
        assert layers_mod._flash_mesh_ok(ctx, 8, 7, 7, require_tpu=False)

    def test_auto_stays_off_without_context_on_cpu(self):
        # multi-device CPU, no flash_mesh: einsum path (existing behavior)
        assert not layers_mod._flash_available()
