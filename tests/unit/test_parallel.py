"""Mesh + sharded training step on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.parallel.mesh import make_mesh, mesh_axis_sizes, param_pspecs, shard_params

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


class TestMesh:
    def test_axis_sizes(self):
        assert mesh_axis_sizes(1) == (1, 1, 1)
        assert mesh_axis_sizes(2) == (1, 1, 2)
        assert mesh_axis_sizes(4) == (1, 2, 2)
        assert mesh_axis_sizes(8) == (2, 2, 2)

    def test_make_mesh(self):
        mesh = make_mesh(8)
        assert mesh.axis_names == ("dp", "sp", "tp")
        assert mesh.devices.size == 8

    def test_param_pspecs_shard_ffn_and_embed(self):
        from spectral_tpu.models.backbone import FixedSpectralLM
        from spectral_tpu.models.config import TrainConfig

        cfg = TrainConfig(d_model=64, n_layers=1, seq_len=64, kernel_len=16, jpeg_transition=8)
        model = FixedSpectralLM(cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64), jnp.int32))["params"]
        specs = param_pspecs(params)
        flat = {
            "/".join(str(getattr(k, "key", k)) for k in path): spec
            for path, spec in jax.tree_util.tree_flatten_with_path(
                specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)
            )[0]
        }
        assert flat["embed/embedding"] == jax.sharding.PartitionSpec(None, "tp")
        assert flat["block_0/ffn/ffn_in/kernel"] == jax.sharding.PartitionSpec(None, "tp")
        assert flat["block_0/ffn/ffn_out/kernel"] == jax.sharding.PartitionSpec("tp", None)

    def test_sharded_step_matches_unsharded(self):
        """One sharded train step must produce the same loss and (numerically
        close) params as the single-device step."""
        import optax

        from spectral_tpu.models.backbone import FixedSpectralLM
        from spectral_tpu.models.config import TrainConfig
        from spectral_tpu.parallel.sharded_train import make_sharded_train_step
        from spectral_tpu.train.trainer import make_optimizer, make_train_step

        cfg = TrainConfig(
            d_model=64, n_layers=2, seq_len=64, kernel_len=16, jpeg_transition=8,
            batch_size=4, accum_steps=2, dropout=0.0,
        )
        model = FixedSpectralLM(cfg)
        rng = np.random.default_rng(0)
        x0 = jnp.zeros((cfg.batch_size, cfg.seq_len), jnp.int32)
        params0 = model.init(jax.random.PRNGKey(0), x0)["params"]
        bx = jnp.asarray(rng.integers(0, 256, (2, 4, 64)).astype(np.int32))
        by = jnp.asarray(rng.integers(0, 256, (2, 4, 64)).astype(np.int32))
        args = (jnp.int32(24), jnp.float32(1e-3), jax.random.PRNGKey(1))

        tx = make_optimizer(cfg)
        p_ref = jax.tree.map(lambda x: x.copy(), params0)
        ref_step = make_train_step(model, cfg, tx)
        p_ref, _, loss_ref = ref_step(p_ref, tx.init(p_ref), bx, by, *args)

        mesh = make_mesh(8)
        with mesh:
            p_sh = shard_params(jax.tree.map(lambda x: x.copy(), params0), mesh)
            opt_sh = tx.init(p_sh)
            step, opt_sh = make_sharded_train_step(model, cfg, tx, mesh)(p_sh, opt_sh)
            p_sh, _, loss_sh = step(p_sh, opt_sh, bx, by, *args)

        np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
        l_ref = jax.tree.leaves(p_ref)
        l_sh = jax.tree.leaves(p_sh)
        for a, b in zip(l_ref, l_sh):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


    def test_sharded_flat_accum_equals_scan(self):
        """Round 4: the sharded step's flat-accum fold (b-major, shard-
        local) must produce the same optimizer step as the accum scan."""
        from spectral_tpu.models.backbone import FixedSpectralLM
        from spectral_tpu.models.config import TrainConfig
        from spectral_tpu.parallel.sharded_train import make_sharded_train_step
        from spectral_tpu.train.trainer import make_optimizer

        rng = np.random.default_rng(3)
        bx = jnp.asarray(rng.integers(0, 256, (4, 4, 64)).astype(np.int32))
        by = jnp.asarray(rng.integers(0, 256, (4, 4, 64)).astype(np.int32))
        args = (jnp.int32(24), jnp.float32(1e-3), jax.random.PRNGKey(1))

        outs = {}
        for mode in ("never", "always"):
            cfg = TrainConfig(
                d_model=64, n_layers=2, seq_len=64, kernel_len=16,
                jpeg_transition=8, batch_size=4, accum_steps=4, dropout=0.0,
                flatten_accum=mode,
            )
            model = FixedSpectralLM(cfg)
            params0 = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((cfg.batch_size, cfg.seq_len), jnp.int32))["params"]
            tx = make_optimizer(cfg)
            mesh = make_mesh(8)
            with mesh:
                p = shard_params(params0, mesh)
                opt = tx.init(p)
                step, opt = make_sharded_train_step(model, cfg, tx, mesh)(p, opt)
                p, _, loss = step(p, opt, bx, by, *args)
            outs[mode] = (p, float(loss))

        np.testing.assert_allclose(outs["never"][1], outs["always"][1],
                                   rtol=1e-5)
        for a, b in zip(jax.tree.leaves(outs["never"][0]),
                        jax.tree.leaves(outs["always"][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)


class TestFusedDP:
    """The fused Pallas kernels run under a dp mesh via shard_map (VERDICT r2
    missing #2): the dp-sharded fused step must match the single-device
    fused step bit-for-bit in loss and closely in params."""

    def test_fused_dp_step_matches_single_device(self):
        from spectral_tpu.models.backbone import FixedSpectralLM
        from spectral_tpu.models.config import TrainConfig
        from spectral_tpu.parallel.sharded_train import (
            _fused_dp_applicable,
            make_sharded_train_step,
        )
        from spectral_tpu.train.trainer import make_optimizer, make_train_step

        cfg = TrainConfig(
            d_model=64, n_layers=2, seq_len=64, kernel_len=16, jpeg_transition=8,
            batch_size=8, accum_steps=2, dropout=0.0, use_fused_block=True,
            compute_dtype="float32",
        )
        model = FixedSpectralLM(cfg)
        rng = np.random.default_rng(0)
        x0 = jnp.zeros((cfg.batch_size, cfg.seq_len), jnp.int32)
        params0 = model.init(jax.random.PRNGKey(0), x0)["params"]
        bx = jnp.asarray(rng.integers(0, 256, (2, 8, 64)).astype(np.int32))
        by = jnp.asarray(rng.integers(0, 256, (2, 8, 64)).astype(np.int32))
        args = (jnp.int32(24), jnp.float32(1e-3), jax.random.PRNGKey(1))

        tx = make_optimizer(cfg)
        p_ref = jax.tree.map(lambda x: x.copy(), params0)
        ref_step = make_train_step(model, cfg, tx)  # fused single-device
        p_ref, _, loss_ref = ref_step(p_ref, tx.init(p_ref), bx, by, *args)

        mesh = make_mesh(dp=8, sp=1, tp=1)
        assert _fused_dp_applicable(cfg, mesh)
        with mesh:
            p_sh = shard_params(jax.tree.map(lambda x: x.copy(), params0), mesh)
            opt_sh = tx.init(p_sh)
            step, opt_sh = make_sharded_train_step(model, cfg, tx, mesh)(p_sh, opt_sh)
            p_sh, _, loss_sh = step(p_sh, opt_sh, bx, by, *args)

        np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_sh)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)

    def test_fused_dp_hlo_collective_budget(self):
        """Round-5 regression gate on the COMPILED HLO's collective bytes
        (the accounting that exposed 1.1 GB/step of hidden all-gathers on
        the freq-native sp leg — multichip_model.py): the fused dp leg
        must show all-reduce bytes ~= one param-tree grad reduction and
        NOTHING else — a sharding regression (a replicated-vs-sharded
        mismatch anywhere in the step) shows up here as phantom
        all-gathers or inflated all-reduce volume long before real
        hardware would reveal it as a slowdown."""
        from experiments.multichip_model import collect_hlo_collectives
        from spectral_tpu.models.backbone import FixedSpectralLM
        from spectral_tpu.models.config import TrainConfig
        from spectral_tpu.parallel.sharded_train import make_sharded_train_step
        from spectral_tpu.train.trainer import make_optimizer

        cfg = TrainConfig(
            d_model=64, n_layers=2, seq_len=64, kernel_len=16,
            jpeg_transition=8, batch_size=8, accum_steps=1, dropout=0.0,
            use_fused_block=True, compute_dtype="float32",
        )
        model = FixedSpectralLM(cfg)
        x0 = jnp.zeros((cfg.batch_size, cfg.seq_len), jnp.int32)
        params0 = model.init(jax.random.PRNGKey(0), x0)["params"]
        tx = make_optimizer(cfg)
        mesh = make_mesh(dp=8, sp=1, tp=1)
        with mesh:
            p_sh = shard_params(params0, mesh)
            opt_sh = tx.init(p_sh)
            step, opt_sh = make_sharded_train_step(model, cfg, tx, mesh)(
                p_sh, opt_sh)
            bx = jnp.zeros((1, 8, 64), jnp.int32)
            txt = step.lower(
                p_sh, opt_sh, bx, bx, jnp.int32(24), jnp.float32(1e-3),
                jax.random.PRNGKey(1)).compile().as_text()
        coll = collect_hlo_collectives(txt)
        param_bytes = sum(
            np.asarray(l).nbytes for l in jax.tree.leaves(params0))
        ar = coll.pop("all-reduce", 0)
        # grad psum + loss pmean (+ clip norm scalars): one param tree,
        # small slack for scalar reductions
        assert ar <= 1.5 * param_bytes + 4096, (ar, param_bytes)
        assert ar >= 0.5 * param_bytes, (ar, param_bytes)
        # no other collective belongs in a dp-only step
        assert not coll, coll

    def test_fused_dp_not_applicable_under_sp_tp(self):
        from spectral_tpu.models.config import TrainConfig
        from spectral_tpu.parallel.sharded_train import _fused_dp_applicable

        cfg = TrainConfig(use_fused_block=True)
        assert _fused_dp_applicable(cfg, make_mesh(dp=8, sp=1, tp=1))
        assert not _fused_dp_applicable(cfg, make_mesh(dp=2, sp=2, tp=2))
        assert not _fused_dp_applicable(TrainConfig(), make_mesh(dp=8, sp=1, tp=1))


class TestFusedSP:
    """The fused kernels under SEQUENCE parallelism: the tail route splits
    as Ulysses all-to-all conv (global XLA) + per-time-shard tail kernels
    (shard_map) — models/fused_apply._tail_mesh."""

    def _setup(self, dropout=0.0):
        from spectral_tpu.models.backbone import FixedSpectralLM
        from spectral_tpu.models.config import TrainConfig

        cfg = TrainConfig(
            d_model=64, n_layers=2, seq_len=64, kernel_len=16,
            jpeg_transition=8, batch_size=4, accum_steps=2, dropout=dropout,
            use_fused_block=True, compute_dtype="float32",
        )
        model = FixedSpectralLM(cfg)
        x0 = jnp.zeros((4, 64), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x0)["params"]
        return cfg, model, params, make_mesh(dp=2, sp=2, tp=1)

    def test_mode_dispatch(self):
        from spectral_tpu.models.config import TrainConfig
        from spectral_tpu.parallel.sharded_train import _fused_mesh_mode

        cfg = TrainConfig(use_fused_block=True)
        assert _fused_mesh_mode(cfg, make_mesh(dp=8, sp=1, tp=1)) == "dp"
        assert _fused_mesh_mode(cfg, make_mesh(dp=2, sp=2, tp=1)) == "mesh"
        assert _fused_mesh_mode(cfg, make_mesh(dp=1, sp=4, tp=1)) == "mesh"
        assert _fused_mesh_mode(cfg, make_mesh(dp=4, sp=1, tp=2)) == "mesh"
        assert _fused_mesh_mode(cfg, make_mesh(dp=2, sp=2, tp=2)) == "mesh"
        assert _fused_mesh_mode(TrainConfig(), make_mesh(dp=2, sp=2, tp=1)) is None

    def test_sp_fused_forward_and_grads_match_flax(self):
        from spectral_tpu.models.fused_apply import fused_lm_apply
        from spectral_tpu.train.evaluate import cross_entropy

        cfg, model, params, mesh = self._setup()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 256, (4, 64)).astype(np.int32))
        y = jnp.asarray(rng.integers(0, 256, (4, 64)).astype(np.int32))

        ref = model.apply({"params": params}, x, cutoff=jnp.int32(24), deterministic=True)
        with mesh:
            out = jax.jit(
                lambda p, t: fused_lm_apply(p, t, cfg, cutoff=jnp.int32(24),
                                            deterministic=True, mesh=mesh)
            )(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)

        def loss_sp(p):
            return cross_entropy(
                fused_lm_apply(p, x, cfg, cutoff=jnp.int32(24),
                               deterministic=True, mesh=mesh), y)

        def loss_ref(p):
            return cross_entropy(
                model.apply({"params": p}, x, cutoff=jnp.int32(24),
                            deterministic=True), y)

        with mesh:
            g_sp = jax.jit(jax.grad(loss_sp))(params)
        g_ref = jax.grad(loss_ref)(params)
        for a, b in zip(jax.tree.leaves(g_sp), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)

    def test_sp_fused_jaxpr_all_to_all_not_all_gather(self):
        from spectral_tpu.models.fused_apply import fused_lm_apply

        cfg, model, params, mesh = self._setup()
        x = jnp.zeros((4, 64), jnp.int32)
        with mesh:
            jaxpr = str(jax.make_jaxpr(
                lambda p, t: fused_lm_apply(p, t, cfg, cutoff=jnp.int32(24),
                                            deterministic=True, mesh=mesh)
            )(params, x))
        assert "all_to_all" in jaxpr
        assert "all_gather" not in jaxpr

    def test_sp_fused_train_step_matches_single_device(self):
        from spectral_tpu.parallel.sharded_train import (
            _fused_mesh_mode,
            make_sharded_train_step,
        )
        from spectral_tpu.train.trainer import make_optimizer, make_train_step

        cfg, model, params0, mesh = self._setup()
        rng = np.random.default_rng(0)
        bx = jnp.asarray(rng.integers(0, 256, (2, 4, 64)).astype(np.int32))
        by = jnp.asarray(rng.integers(0, 256, (2, 4, 64)).astype(np.int32))
        args = (jnp.int32(24), jnp.float32(1e-3), jax.random.PRNGKey(1))
        tx = make_optimizer(cfg)

        p_ref = jax.tree.map(lambda x: x.copy(), params0)
        ref_step = make_train_step(model, cfg, tx)  # fused single-device
        p_ref, _, loss_ref = ref_step(p_ref, tx.init(p_ref), bx, by, *args)

        assert _fused_mesh_mode(cfg, mesh) == "mesh"
        with mesh:
            p_sh = shard_params(jax.tree.map(lambda x: x.copy(), params0), mesh)
            opt = tx.init(p_sh)
            step, opt = make_sharded_train_step(model, cfg, tx, mesh)(p_sh, opt)
            p_sh, _, loss_sh = step(p_sh, opt, bx, by, *args)

        np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_sh)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)

    def test_sp_fused_dropout_step_runs_finite(self):
        """Dropout rides the host-mask fallback off-TPU; streams decorrelate
        per shard via the axis-index seed fold — just prove the sharded
        step runs and descends territory is the descent gate's job."""
        from spectral_tpu.parallel.sharded_train import make_sharded_train_step
        from spectral_tpu.train.trainer import make_optimizer

        cfg, model, params0, mesh = self._setup(dropout=0.1)
        rng = np.random.default_rng(0)
        bx = jnp.asarray(rng.integers(0, 256, (2, 4, 64)).astype(np.int32))
        by = jnp.asarray(rng.integers(0, 256, (2, 4, 64)).astype(np.int32))
        tx = make_optimizer(cfg)
        with mesh:
            p = shard_params(jax.tree.map(lambda x: x.copy(), params0), mesh)
            opt = tx.init(p)
            step, opt = make_sharded_train_step(model, cfg, tx, mesh)(p, opt)
            p, _, loss = step(p, opt, bx, by, jnp.int32(24), jnp.float32(1e-3),
                              jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))


class TestFusedTP:
    """The fused tail under TENSOR parallelism: hidden-sharded FFN
    (Megatron column/row split) + residual_alpha=1/tp partial sums whose
    psum over tp is EXACTLY the unsharded tail — models/fused_apply.
    _tail_mesh.  Closes the last flax-only mesh mode (ROADMAP r3)."""

    def _setup(self, dp=4, sp=1, tp=2, dropout=0.0):
        from spectral_tpu.models.backbone import FixedSpectralLM
        from spectral_tpu.models.config import TrainConfig

        cfg = TrainConfig(
            d_model=64, n_layers=2, seq_len=64, kernel_len=16,
            jpeg_transition=8, batch_size=4, accum_steps=2, dropout=dropout,
            use_fused_block=True, compute_dtype="float32",
        )
        model = FixedSpectralLM(cfg)
        x0 = jnp.zeros((4, 64), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x0)["params"]
        return cfg, model, params, make_mesh(dp=dp, sp=sp, tp=tp)

    def test_tp_fused_forward_and_grads_match_flax(self):
        from spectral_tpu.models.fused_apply import fused_lm_apply
        from spectral_tpu.train.evaluate import cross_entropy

        cfg, model, params, mesh = self._setup(dp=4, sp=1, tp=2)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 256, (4, 64)).astype(np.int32))
        y = jnp.asarray(rng.integers(0, 256, (4, 64)).astype(np.int32))

        ref = model.apply({"params": params}, x, cutoff=jnp.int32(24), deterministic=True)
        with mesh:
            out = jax.jit(
                lambda p, t: fused_lm_apply(p, t, cfg, cutoff=jnp.int32(24),
                                            deterministic=True, mesh=mesh)
            )(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)

        def loss_tp(p):
            return cross_entropy(
                fused_lm_apply(p, x, cfg, cutoff=jnp.int32(24),
                               deterministic=True, mesh=mesh), y)

        def loss_ref(p):
            return cross_entropy(
                model.apply({"params": p}, x, cutoff=jnp.int32(24),
                            deterministic=True), y)

        with mesh:
            g_tp = jax.jit(jax.grad(loss_tp))(params)
        g_ref = jax.grad(loss_ref)(params)
        for a, b in zip(jax.tree.leaves(g_tp), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)

    def test_full_mesh_dp_sp_tp_train_step_matches_single_device(self):
        """dp=2 x sp=2 x tp=2: all three axes shard the FUSED step at once."""
        from spectral_tpu.parallel.sharded_train import (
            _fused_mesh_mode,
            make_sharded_train_step,
        )
        from spectral_tpu.train.trainer import make_optimizer, make_train_step

        cfg, model, params0, mesh = self._setup(dp=2, sp=2, tp=2)
        rng = np.random.default_rng(0)
        bx = jnp.asarray(rng.integers(0, 256, (2, 4, 64)).astype(np.int32))
        by = jnp.asarray(rng.integers(0, 256, (2, 4, 64)).astype(np.int32))
        args = (jnp.int32(24), jnp.float32(1e-3), jax.random.PRNGKey(1))
        tx = make_optimizer(cfg)

        p_ref = jax.tree.map(lambda x: x.copy(), params0)
        ref_step = make_train_step(model, cfg, tx)  # fused single-device
        p_ref, _, loss_ref = ref_step(p_ref, tx.init(p_ref), bx, by, *args)

        assert _fused_mesh_mode(cfg, mesh) == "mesh"
        with mesh:
            p_sh = shard_params(jax.tree.map(lambda x: x.copy(), params0), mesh)
            opt = tx.init(p_sh)
            step, opt = make_sharded_train_step(model, cfg, tx, mesh)(p_sh, opt)
            p_sh, _, loss_sh = step(p_sh, opt, bx, by, *args)

        np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_sh)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)

    def test_tp_fused_dropout_step_runs_finite(self):
        """Dropout under tp: conv/output masks shared across tp shards (the
        psum linearity requires it), hidden mask tp-correlated by design."""
        from spectral_tpu.parallel.sharded_train import make_sharded_train_step
        from spectral_tpu.train.trainer import make_optimizer

        cfg, model, params0, mesh = self._setup(dp=4, sp=1, tp=2, dropout=0.1)
        rng = np.random.default_rng(0)
        bx = jnp.asarray(rng.integers(0, 256, (2, 4, 64)).astype(np.int32))
        by = jnp.asarray(rng.integers(0, 256, (2, 4, 64)).astype(np.int32))
        tx = make_optimizer(cfg)
        with mesh:
            p = shard_params(jax.tree.map(lambda x: x.copy(), params0), mesh)
            opt = tx.init(p)
            step, opt = make_sharded_train_step(model, cfg, tx, mesh)(p, opt)
            p, _, loss = step(p, opt, bx, by, jnp.int32(24), jnp.float32(1e-3),
                              jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))


class TestUlyssesWiring:
    """The sequence-sharded conv is the TRAINING path under sp (VERDICT #3)."""

    def _model_pair(self, **cfg_kw):
        from spectral_tpu.models.backbone import FixedSpectralLM
        from spectral_tpu.models.config import TrainConfig

        cfg = TrainConfig(
            d_model=64, n_layers=2, seq_len=64, kernel_len=16, jpeg_transition=8, dropout=0.0,
            **cfg_kw,
        )
        mesh = make_mesh(8)
        return FixedSpectralLM(cfg), FixedSpectralLM(cfg, mesh=mesh), mesh, cfg

    def test_sp_wired_forward_matches_unsharded(self):
        m_plain, m_sp, mesh, cfg = self._model_pair()
        x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (4, 64)).astype(np.int32))
        params = m_plain.init(jax.random.PRNGKey(0), x)["params"]
        y_pl = m_plain.apply({"params": params}, x, cutoff=jnp.int32(24))
        with mesh:
            y_sp = m_sp.apply({"params": params}, x, cutoff=jnp.int32(24))
        np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_pl), rtol=1e-4, atol=1e-4)

    def test_sp_wired_grads_match_unsharded(self):
        m_plain, m_sp, mesh, cfg = self._model_pair()
        x = jnp.asarray(np.random.default_rng(1).integers(0, 256, (4, 64)).astype(np.int32))
        params = m_plain.init(jax.random.PRNGKey(0), x)["params"]

        def loss(m):
            return lambda p: jnp.sum(m.apply({"params": p}, x, cutoff=jnp.int32(24)) ** 2)

        g_pl = jax.jit(jax.grad(loss(m_plain)))(params)
        g_sp = jax.jit(jax.grad(loss(m_sp)))(params)
        for a, b in zip(jax.tree.leaves(g_sp), jax.tree.leaves(g_pl)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)

    def test_jaxpr_proves_all_to_all_not_all_gather(self):
        """SURVEY §5.7: the headline TPU feature must be IN the compiled
        step — the traced step contains the Ulysses all_to_all primitive and
        no explicit all_gather of the time axis."""
        m_plain, m_sp, mesh, cfg = self._model_pair()
        x = jnp.zeros((4, 64), jnp.int32)
        params = m_plain.init(jax.random.PRNGKey(0), x)["params"]
        jaxpr = str(
            jax.make_jaxpr(lambda p, x: m_sp.apply({"params": p}, x, cutoff=jnp.int32(24)))(params, x)
        )
        assert "all_to_all" in jaxpr
        assert "all_gather" not in jaxpr
        # one conv per block, two all-to-alls per conv
        assert jaxpr.count("all_to_all") == 2 * cfg.n_layers

    def test_sharded_train_step_with_ulysses(self):
        """End-to-end sharded train step with the mesh-wired model: loss
        matches the unsharded step (the Ulysses path is numerically the same
        conv)."""
        from spectral_tpu.models.backbone import FixedSpectralLM
        from spectral_tpu.models.config import TrainConfig
        from spectral_tpu.parallel.sharded_train import make_sharded_train_step
        from spectral_tpu.train.trainer import make_optimizer, make_train_step

        cfg = TrainConfig(
            d_model=64, n_layers=2, seq_len=64, kernel_len=16, jpeg_transition=8,
            batch_size=4, accum_steps=2, dropout=0.0,
        )
        mesh = make_mesh(8)
        model_sp = FixedSpectralLM(cfg, mesh=mesh)
        model_pl = FixedSpectralLM(cfg)
        rng = np.random.default_rng(0)
        x0 = jnp.zeros((cfg.batch_size, cfg.seq_len), jnp.int32)
        params0 = model_pl.init(jax.random.PRNGKey(0), x0)["params"]
        bx = jnp.asarray(rng.integers(0, 256, (2, 4, 64)).astype(np.int32))
        by = jnp.asarray(rng.integers(0, 256, (2, 4, 64)).astype(np.int32))
        args = (jnp.int32(24), jnp.float32(1e-3), jax.random.PRNGKey(1))

        tx = make_optimizer(cfg)
        p_ref, _, loss_ref = make_train_step(model_pl, cfg, tx)(
            jax.tree.map(lambda x: x.copy(), params0), tx.init(params0), bx, by, *args
        )
        with mesh:
            p_sh = shard_params(jax.tree.map(lambda x: x.copy(), params0), mesh)
            opt_sh = tx.init(p_sh)
            step, opt_sh = make_sharded_train_step(model_sp, cfg, tx, mesh)(p_sh, opt_sh)
            p_sh, _, loss_sh = step(p_sh, opt_sh, bx, by, *args)
        np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_sh)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)

    def test_larger_shape_dryrun(self):
        """VERDICT #10: a d256/seq512 sharded train step on the 8-device CPU
        mesh — shapes where sp/tp layout actually bites.  Wall-clock recorded
        in MULTICHIP notes."""
        import time

        import optax

        from spectral_tpu.models.backbone import FixedSpectralLM
        from spectral_tpu.models.config import TrainConfig
        from spectral_tpu.parallel.sharded_train import make_sharded_train_step
        from spectral_tpu.train.trainer import make_optimizer

        cfg = TrainConfig(
            d_model=256, n_layers=2, seq_len=512, kernel_len=64, jpeg_transition=32,
            batch_size=4, accum_steps=1, dropout=0.0,
        )
        mesh = make_mesh(8)
        model = FixedSpectralLM(cfg, mesh=mesh)
        rng = np.random.default_rng(0)
        x0 = jnp.zeros((cfg.batch_size, cfg.seq_len), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x0)["params"]
        tx = make_optimizer(cfg)
        t0 = time.time()
        with mesh:
            p_sh = shard_params(params, mesh)
            opt_sh = tx.init(p_sh)
            step, opt_sh = make_sharded_train_step(model, cfg, tx, mesh)(p_sh, opt_sh)
            bx = jnp.asarray(rng.integers(0, 256, (1, 4, 512)).astype(np.int32))
            by = jnp.asarray(rng.integers(0, 256, (1, 4, 512)).astype(np.int32))
            _, _, loss = step(p_sh, opt_sh, bx, by, jnp.int32(128), jnp.float32(1e-3), jax.random.PRNGKey(1))
            loss = float(loss)
        assert np.isfinite(loss)
        print(f"\nlarger-shape dryrun d256/seq512/8dev: loss={loss:.4f} wall={time.time()-t0:.1f}s")


class TestProfiling:
    def test_measure_bandwidth_and_gate(self):
        import jax.numpy as jnp

        from spectral_tpu.utils.profiling import assert_roofline, measure_bandwidth

        x = jnp.ones((256, 256), jnp.float32)
        f = jax.jit(lambda x: x * 2.0)
        r = measure_bandwidth(f, x, bytes_moved=2 * x.size * 4, iters=5, warmup=2)
        assert r.achieved_gbps > 0 and r.peak_gbps > 0
        assert_roofline(r, min_fraction=0.0)
        with pytest.raises(AssertionError, match="roofline"):
            assert_roofline(r, min_fraction=10.0)


class TestSPVariants:
    """Round-4 (VERDICT r3 #5): the bicameral and frequency-native block
    variants run UNDER sp through their own sharded routes — sharded ==
    unsharded parity for values and grads.  Replaces the r2/r3 loud-error
    guard (models/backbone.py no longer raises for variants + sp)."""

    def _pair(self, **cfg_kw):
        from spectral_tpu.models.backbone import FixedSpectralLM
        from spectral_tpu.models.config import TrainConfig

        cfg = TrainConfig(
            d_model=64, n_layers=2, seq_len=64, kernel_len=16,
            jpeg_transition=8, dropout=0.0, **cfg_kw,
        )
        mesh = make_mesh(dp=2, sp=4, tp=1)
        return FixedSpectralLM(cfg), FixedSpectralLM(cfg, mesh=mesh), mesh

    @pytest.mark.parametrize("variant", ["bicameral", "frequency_native"])
    def test_variant_sp_forward_matches_unsharded(self, variant):
        m_pl, m_sp, mesh = self._pair(**{variant: True})
        x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (4, 64)).astype(np.int32))
        params = m_pl.init(jax.random.PRNGKey(0), x)["params"]
        y_pl = m_pl.apply({"params": params}, x, cutoff=jnp.int32(24))
        with mesh:
            y_sp = jax.jit(lambda p, x_: m_sp.apply(
                {"params": p}, x_, cutoff=jnp.int32(24)))(params, x)
        np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_pl),
                                   rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("variant", ["bicameral", "frequency_native"])
    def test_variant_sp_grads_match_unsharded(self, variant):
        m_pl, m_sp, mesh = self._pair(**{variant: True})
        x = jnp.asarray(np.random.default_rng(1).integers(0, 256, (4, 64)).astype(np.int32))
        params = m_pl.init(jax.random.PRNGKey(0), x)["params"]

        def loss(m):
            return lambda p: jnp.sum(
                m.apply({"params": p}, x, cutoff=jnp.int32(24)) ** 2)

        g_pl = jax.jit(jax.grad(loss(m_pl)))(params)
        with mesh:
            g_sp = jax.jit(jax.grad(loss(m_sp)))(params)
        for a, b in zip(jax.tree.leaves(g_sp), jax.tree.leaves(g_pl)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4)

    @pytest.mark.parametrize("variant", ["bicameral", "frequency_native"])
    def test_variant_sp_train_step_runs_finite(self, variant):
        """End-to-end sharded train step for each variant under the full
        dp=2 x sp=2 x tp=2 mesh (the flax mesh mode)."""
        from spectral_tpu.models.backbone import FixedSpectralLM
        from spectral_tpu.models.config import TrainConfig
        from spectral_tpu.parallel.sharded_train import make_sharded_train_step
        from spectral_tpu.train.trainer import make_optimizer

        cfg = TrainConfig(
            d_model=64, n_layers=2, seq_len=64, kernel_len=16,
            jpeg_transition=8, batch_size=4, accum_steps=2, dropout=0.1,
            **{variant: True},
        )
        mesh = make_mesh(dp=2, sp=2, tp=2)
        model = FixedSpectralLM(cfg, mesh=mesh)
        rng = np.random.default_rng(0)
        x0 = jnp.zeros((cfg.batch_size, cfg.seq_len), jnp.int32)
        with mesh:
            params = model.init(jax.random.PRNGKey(0), x0)["params"]
            tx = make_optimizer(cfg)
            p = shard_params(params, mesh)
            opt = tx.init(p)
            step, opt = make_sharded_train_step(model, cfg, tx, mesh)(p, opt)
            bx = jnp.asarray(rng.integers(0, 256, (2, 4, 64)).astype(np.int32))
            by = jnp.asarray(rng.integers(0, 256, (2, 4, 64)).astype(np.int32))
            p, _, loss = step(p, opt, bx, by, jnp.int32(24),
                              jnp.float32(1e-3), jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
