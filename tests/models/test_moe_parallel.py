"""Expert-parallel MoE: sharded dispatch must match single-device output."""

import jax
import jax.numpy as jnp
import numpy as np

from colpali_tpu.models.qwen3_5 import Qwen35TextConfig, SparseMoeBlock
from colpali_tpu.parallel.sharding import batch_sharding, make_mesh, tree_shardings


class TestExpertParallel:
    def test_ep_sharded_matches_single_device(self):
        cfg = Qwen35TextConfig(
            hidden_size=16, num_experts=8, num_experts_per_tok=2,
            moe_intermediate_size=8, shared_expert_intermediate_size=8,
            moe_capacity_factor=8.0 / 2,  # capacity == T: no drops, exact
        )
        block = SparseMoeBlock(cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 8, 16)).astype(np.float32))
        params = block.init(jax.random.PRNGKey(1), x)["params"]
        expected = np.asarray(block.apply({"params": params}, x))

        mesh = make_mesh(data=2, model=4)
        specs = tree_shardings(params, mesh)
        # the expert axis must actually be sharded over `model`
        assert specs["experts"]["gate_proj"].spec == jax.sharding.PartitionSpec("model", None, None)
        sharded_params = jax.device_put(params, specs)
        sharded_x = jax.device_put(x, batch_sharding(mesh))
        got = np.asarray(
            jax.jit(lambda p, xx: block.apply({"params": p}, xx))(sharded_params, sharded_x)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)
