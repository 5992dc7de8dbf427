"""Tests for the dynamic w8a8 serving path (ops/quant_dense.py).

Covers the op's accuracy and its shape self-gating (small/batched/integer
contractions must fall through to the EXACT dot bitwise), plus the
trace-time `quantized_acts()` policy plumbing through nn.Dense and the
shared transformer blocks in models/layers.py.

The tiny parity models elsewhere in the suite are all below MIN_QUANT_DIM
(=512) by design, so they stay exact under the policy; these tests use
>=512-wide layers to actually exercise the int8 path.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from colpali_tpu.models.layers import Attention, GatedMLP, MLP, dense_dot_general, quantized_acts
from colpali_tpu.ops.quant_dense import MIN_QUANT_DIM, int8_dot_general, quantization_error

DN = lambda nd: (((nd - 1,), (0,)), ((), ()))  # noqa: E731  (nn.Dense pattern)


def _rand(rng, shape, dtype=jnp.bfloat16):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32), dtype)


class TestOpAccuracy:
    def test_relative_error_small(self):
        rng = np.random.default_rng(0)
        x = _rand(rng, (64, 1024))
        w = _rand(rng, (1024, 1024))
        # Dynamic per-row/per-col symmetric int8 on gaussian data lands
        # well under 1% relative L2; 2% is a loose regression bound.
        assert quantization_error(x, w) < 0.02

    def test_outliers_absorbed_by_row_scales(self):
        # A single huge activation row must not poison other rows' scales.
        rng = np.random.default_rng(1)
        x = np.array(_rand(rng, (8, 512), jnp.float32))
        x[0] *= 1e3
        w = _rand(rng, (512, 512), jnp.float32)
        err = quantization_error(jnp.asarray(x), w)
        assert err < 0.02

    def test_preferred_element_type_respected(self):
        rng = np.random.default_rng(2)
        x = _rand(rng, (4, 512))
        w = _rand(rng, (512, 512))
        out = int8_dot_general(x, w, DN(2), preferred_element_type=jnp.float32)
        assert out.dtype == jnp.float32

    def test_3d_lhs(self):
        rng = np.random.default_rng(3)
        x = _rand(rng, (2, 7, 512))
        w = _rand(rng, (512, 640))
        out = int8_dot_general(x, w, DN(3), preferred_element_type=jnp.float32)
        exact = lax.dot_general(
            x.astype(jnp.float32), w.astype(jnp.float32), DN(3)
        )
        rel = np.linalg.norm(np.asarray(out - exact)) / np.linalg.norm(np.asarray(exact))
        assert out.shape == (2, 7, 640)
        assert rel < 0.02


class TestSelfGating:
    """Ineligible shapes must hit the exact dot BITWISE (no quantization)."""

    def _assert_exact(self, x, w, dn=None):
        dn = dn or DN(x.ndim)
        got = int8_dot_general(x, w, dn)
        want = lax.dot_general(x, w, dn)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_small_contraction_dim(self):
        rng = np.random.default_rng(4)
        self._assert_exact(_rand(rng, (16, 128)), _rand(rng, (128, 1024)))

    def test_small_output_dim(self):
        # The 128-d retrieval head shape: must stay exact by construction.
        rng = np.random.default_rng(5)
        self._assert_exact(_rand(rng, (16, 2048)), _rand(rng, (2048, 128)))

    def test_integer_inputs_fall_through(self):
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.integers(-5, 5, (8, 512)), jnp.int8)
        w = jnp.asarray(rng.integers(-5, 5, (512, 512)), jnp.int8)
        self._assert_exact(x, w)

    def test_batch_dims_fall_through(self):
        rng = np.random.default_rng(7)
        x = _rand(rng, (2, 16, 512), jnp.float32)
        w = _rand(rng, (2, 512, 512), jnp.float32)
        dn = (((2,), (1,)), ((0,), (0,)))
        self._assert_exact(x, w, dn)

    def test_threshold_boundary(self):
        # Exactly MIN_QUANT_DIM is eligible; one below is not.
        rng = np.random.default_rng(8)
        d = MIN_QUANT_DIM
        x = _rand(rng, (4, d))
        w_ok = _rand(rng, (d, d))
        w_small = _rand(rng, (d, d - 1))
        quant = int8_dot_general(x, w_ok, DN(2), preferred_element_type=jnp.float32)
        exact = lax.dot_general(x, w_ok, DN(2), preferred_element_type=jnp.float32)
        assert not np.array_equal(np.asarray(quant), np.asarray(exact))
        self._assert_exact(x, w_small)


class TestPolicyPlumbing:
    """quantized_acts() is a TRACE-time switch through dense_dot_general()."""

    def test_default_is_none(self):
        assert dense_dot_general() is None
        with quantized_acts():
            assert dense_dot_general() is int8_dot_general
        assert dense_dot_general() is None

    def test_dense_under_policy(self):
        rng = np.random.default_rng(9)
        x = _rand(rng, (4, 1024), jnp.float32)
        mod_exact = nn.Dense(1024, use_bias=False)
        params = mod_exact.init(jax.random.PRNGKey(0), x)
        exact = mod_exact.apply(params, x)
        with quantized_acts():
            mod_q = nn.Dense(1024, use_bias=False, dot_general=dense_dot_general())
        quant = mod_q.apply(params, x)
        rel = np.linalg.norm(np.asarray(quant - exact)) / np.linalg.norm(np.asarray(exact))
        assert 0 < rel < 0.02

    def test_trace_time_semantics_under_jit(self):
        """The policy is captured when the forward is TRACED, not when called
        — and each mode needs its own function object (fresh closure), per
        the quantized_acts docstring."""
        rng = np.random.default_rng(10)
        x = _rand(rng, (4, 512), jnp.float32)
        params = {"w": _rand(rng, (512, 512), jnp.float32)}

        def make_fwd():
            def fwd(p, x):
                dg = dense_dot_general() or lax.dot_general
                return dg(x, p["w"], DN(2))
            return fwd

        exact_fn = jax.jit(make_fwd())
        exact = exact_fn(params, x)  # traced OUTSIDE the context -> exact
        with quantized_acts():
            quant_fn = jax.jit(make_fwd())
            quant = quant_fn(params, x)  # traced INSIDE -> int8
        # After exiting, the compiled programs keep their traced behavior.
        np.testing.assert_array_equal(np.asarray(exact_fn(params, x)), np.asarray(exact))
        np.testing.assert_array_equal(np.asarray(quant_fn(params, x)), np.asarray(quant))
        assert not np.array_equal(np.asarray(quant), np.asarray(exact))

    def test_jaxpr_cache_hazard_same_function(self):
        """Pins the hazard the docstring warns about: two jax.jit wrappers
        of the SAME function share the jaxpr trace cache, so the in-context
        wrapper silently serves the exact program traced outside. If this
        test starts failing, JAX changed its cache keying and the
        quantized_acts docstring should be relaxed."""
        rng = np.random.default_rng(15)
        x = _rand(rng, (4, 512), jnp.float32)
        w = _rand(rng, (512, 512), jnp.float32)

        def fwd(x, w):
            dg = dense_dot_general() or lax.dot_general
            return dg(x, w, DN(2))

        exact = jax.jit(fwd)(x, w)
        with quantized_acts():
            shared = jax.jit(fwd)(x, w)
        np.testing.assert_array_equal(np.asarray(shared), np.asarray(exact))


class TestBlocksUnderPolicy:
    """The shared transformer blocks route their projections through the
    policy; at >=512 width the quantized forward must be close-but-not-equal
    to the exact one, and identical when the policy is off."""

    def _compare(self, build, x, tol=0.05):
        # @nn.compact blocks read the policy when the forward RUNS (i.e. at
        # trace time under jit), so apply() must happen inside the context.
        mod = build()
        params = mod.init(jax.random.PRNGKey(0), *x)
        exact = mod.apply(params, *x)
        with quantized_acts():
            quant = mod.apply(params, *x)
        e = np.asarray(exact, np.float32)
        q = np.asarray(quant, np.float32)
        rel = np.linalg.norm(q - e) / np.linalg.norm(e)
        assert 0 < rel < tol
        # Outside the context the same module is exact again (eager apply).
        again = mod.apply(params, *x)
        np.testing.assert_array_equal(np.asarray(again), np.asarray(exact))

    def test_gated_mlp(self):
        rng = np.random.default_rng(11)
        x = _rand(rng, (2, 3, 512), jnp.float32)
        self._compare(lambda: GatedMLP(intermediate_size=1024, dtype=jnp.float32), (x,))

    def test_mlp(self):
        rng = np.random.default_rng(12)
        x = _rand(rng, (2, 3, 512), jnp.float32)
        self._compare(lambda: MLP(intermediate_size=1024, dtype=jnp.float32), (x,))

    def test_attention(self):
        rng = np.random.default_rng(13)
        x = _rand(rng, (2, 6, 512), jnp.float32)
        build = lambda: Attention(  # noqa: E731
            num_heads=8, head_dim=64, dtype=jnp.float32
        )
        self._compare(build, (x,))


def test_colqwen2_forward_under_policy():
    """End-to-end: a >=512-wide ColQwen2 text-only forward quantizes the
    decoder projections while the 128-d retrieval head stays exact; the
    result is close-but-not-equal to the exact forward."""
    from colpali_tpu.models.qwen2_vl import ColQwen2, Qwen2TextConfig, Qwen2VLConfig

    cfg = Qwen2VLConfig(
        text=Qwen2TextConfig(
            vocab_size=128, hidden_size=512, intermediate_size=1024,
            num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=2,
            head_dim=64, mrope_section=(8, 12, 12),
        )
    )
    ids = jnp.asarray(np.random.default_rng(14).integers(3, 100, (1, 12)))
    mask = jnp.ones_like(ids)
    model = ColQwen2(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    exact = model.apply(params, ids, mask)
    with quantized_acts():
        model_q = ColQwen2(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        quant = model_q.apply(params, ids, mask)
    rel = np.linalg.norm(np.asarray(quant - exact)) / np.linalg.norm(np.asarray(exact))
    assert 0 < rel < 0.05


class TestStoredInt8:
    """quantize_params + QDense stored-kernel path (w8 static)."""

    def _tiny_colqwen2(self):
        from colpali_tpu.models.qwen2_vl import ColQwen2, Qwen2TextConfig, Qwen2VLConfig

        cfg = Qwen2VLConfig(
            text=Qwen2TextConfig(
                vocab_size=128, hidden_size=512, intermediate_size=1024,
                num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=2,
                head_dim=64, mrope_section=(8, 12, 12),
            )
        )
        return ColQwen2(cfg, dtype=jnp.float32, param_dtype=jnp.float32)

    def test_quantize_params_structure(self):
        from colpali_tpu.ops.quant_dense import quantize_params

        model = self._tiny_colqwen2()
        ids = jnp.asarray(np.random.default_rng(0).integers(3, 100, (1, 8)))
        mask = jnp.ones_like(ids)
        params = model.init(jax.random.PRNGKey(0), ids, mask)
        qp, qc = quantize_params(params["params"])
        import flax

        flat = flax.traverse_util.flatten_dict(params["params"])
        qflat = flax.traverse_util.flatten_dict(qp)
        sflat = flax.traverse_util.flatten_dict(qc)
        assert set(flat) == set(qflat)  # same param tree structure
        n_q = 0
        for path, leaf in qflat.items():
            if leaf.dtype == jnp.int8:
                n_q += 1
                spath = path[:-1] + ("kernel_scale",)
                assert spath in sflat
                s = sflat[spath]
                assert s.shape[-1] == leaf.shape[-1] and s.shape[-2] == 1
            else:
                np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat[path]))
        # hidden 512 / intermediate 1024: gate+up+down per layer qualify;
        # q/k/v/o (512x512, 512x128...) — q & o are 512x512 -> qualify
        assert n_q >= 2 * 3
        # the 128-d retrieval head must NOT be quantized
        head = flax.traverse_util.flatten_dict(qp)[("head", "custom_text_proj", "kernel")]
        assert head.dtype != jnp.int8

    def test_stored_matches_dynamic_closely(self):
        """Stored-int8 forward ~= dynamic w8a8 forward (same scheme, the
        only difference is when the weight quantizes), both close to exact."""
        from colpali_tpu.ops.quant_dense import quantize_params

        model = self._tiny_colqwen2()
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(3, 100, (2, 12)))
        mask = jnp.ones_like(ids)
        params = model.init(jax.random.PRNGKey(0), ids, mask)
        exact = model.apply(params, ids, mask)
        with quantized_acts():
            dynamic = model.apply(params, ids, mask)
        qp, qc = quantize_params(params["params"])
        stored = model.apply({"params": qp, "quant": qc}, ids, mask)
        e, d, s = (np.asarray(t, np.float32) for t in (exact, dynamic, stored))
        rel_sd = np.linalg.norm(s - d) / np.linalg.norm(d)
        rel_se = np.linalg.norm(s - e) / np.linalg.norm(e)
        assert rel_sd < 1e-5  # identical math, different schedule
        assert 0 < rel_se < 0.05

    def test_stored_scan_layers(self):
        """Scan-stacked 3D kernels quantize per (layer, channel) and the
        'quant' collection scans alongside params."""
        from colpali_tpu.models.qwen2_vl import ColQwen2, Qwen2TextConfig, Qwen2VLConfig
        from colpali_tpu.ops.quant_dense import quantize_params

        cfg = Qwen2VLConfig(
            text=Qwen2TextConfig(
                vocab_size=128, hidden_size=512, intermediate_size=1024,
                num_hidden_layers=3, num_attention_heads=8, num_key_value_heads=2,
                head_dim=64, mrope_section=(8, 12, 12),
            )
        )
        ids = jnp.asarray(np.random.default_rng(2).integers(3, 100, (1, 10)))
        mask = jnp.ones_like(ids)
        unrolled = ColQwen2(cfg, dtype=jnp.float32, param_dtype=jnp.float32, scan_layers=False)
        scanned = ColQwen2(cfg, dtype=jnp.float32, param_dtype=jnp.float32, scan_layers=True)
        params_u = unrolled.init(jax.random.PRNGKey(0), ids, mask)
        from colpali_tpu.core.hf_loader import stack_layer_params

        params_s = scanned.init(jax.random.PRNGKey(0), ids, mask)
        qp_s, qc_s = quantize_params(params_s["params"])
        import flax

        stacked_q = [
            (p, l) for p, l in flax.traverse_util.flatten_dict(qp_s).items() if l.dtype == jnp.int8 and l.ndim == 3
        ]
        assert stacked_q, "scan-stacked kernels should quantize as 3D"
        out = scanned.apply({"params": qp_s, "quant": qc_s}, ids, mask)
        exact = scanned.apply(params_s, ids, mask)
        rel = np.linalg.norm(np.asarray(out - exact)) / np.linalg.norm(np.asarray(exact))
        assert 0 < rel < 0.05

    def test_qdense_init_tree_matches_nn_dense(self):
        """QDense must be checkpoint-compatible with nn.Dense: identical
        param names, shapes, dtypes, and initial values."""
        from colpali_tpu.models.layers import QDense

        x = jnp.ones((2, 16))
        for use_bias in (True, False):
            a = nn.Dense(8, use_bias=use_bias, param_dtype=jnp.float32)
            b = QDense(8, use_bias=use_bias, param_dtype=jnp.float32)
            pa = a.init(jax.random.PRNGKey(7), x)
            pb = b.init(jax.random.PRNGKey(7), x)
            assert jax.tree.structure(pa) == jax.tree.structure(pb)
            for la, lb in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
                np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
            np.testing.assert_array_equal(
                np.asarray(a.apply(pa, x)), np.asarray(b.apply(pb, x))
            )

    def test_int8_kernel_without_quant_collection_raises(self):
        from colpali_tpu.models.layers import QDense
        from colpali_tpu.ops.quant_dense import quantize_params

        mod = QDense(512, use_bias=False, param_dtype=jnp.float32)
        x = jnp.ones((2, 512))
        p = mod.init(jax.random.PRNGKey(0), x)
        qp, qc = quantize_params(p["params"])
        out = mod.apply({"params": qp, "quant": qc}, x)
        assert np.isfinite(np.asarray(out)).all()
        with pytest.raises(ValueError, match="quant"):
            mod.apply({"params": qp}, x)


def test_stored_int8_under_mesh_dp():
    """Quantized (w8 static) serving composes with GSPMD data-parallel
    serving: params+scales replicated, batch sharded over the 8-device
    mesh — output equals the single-device stored forward."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from colpali_tpu.models.qwen2_vl import ColQwen2, Qwen2TextConfig, Qwen2VLConfig
    from colpali_tpu.ops.quant_dense import quantize_params

    cfg = Qwen2VLConfig(
        text=Qwen2TextConfig(
            vocab_size=128, hidden_size=512, intermediate_size=1024,
            num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=2,
            head_dim=64, mrope_section=(8, 12, 12),
        )
    )
    model = ColQwen2(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(3).integers(3, 100, (8, 10)))
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    qp, qc = quantize_params(params["params"])
    variables = {"params": qp, "quant": qc}
    single = np.asarray(model.apply(variables, ids, mask))

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    batch_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    vs = jax.device_put(variables, repl)
    ids_s = jax.device_put(ids, batch_sharding)
    mask_s = jax.device_put(mask, batch_sharding)
    out = np.asarray(jax.jit(lambda v, i, m: model.apply(v, i, m))(vs, ids_s, mask_s))
    # Activation quantization is DISCONTINUOUS (round at the int8 grid), so
    # different XLA compilations (eager / jit / partitioned) may flip
    # boundary values — measured ~2e-3 max across compilations vs 4e-7 on
    # the exact path. Assert agreement at well below the quantization error
    # itself (~1% rel), not bitwise.
    rel = np.linalg.norm(out - single) / np.linalg.norm(single)
    assert rel < 5e-3
    exact = np.asarray(model.apply(params, ids, mask))
    rel_exact = np.linalg.norm(out - exact) / np.linalg.norm(exact)
    assert 0 < rel_exact < 0.05
