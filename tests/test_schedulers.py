"""layer_linear_warmup progressive unfreezing (reference
utils/utils.py:131-169 + train.py:35-58)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from diffdock_tpu.train.schedulers import (
    LayerWarmupScheduler, layer_warmup_mask, unfreeze_stage,
)


def test_unfreeze_stage_mapping():
    nc = 6
    # heads at stage 0 (reference utils/utils.py:140-142)
    assert unfreeze_stage(("final_conv", "w"), nc) == 0
    assert unfreeze_stage(("tr_final_layer", "Dense_0", "kernel"), nc) == 0
    assert unfreeze_stage(("tor_bond_conv", "w"), nc) == 0
    # conv layers top-down: conv_{nc-1} first, conv_0 last
    assert unfreeze_stage(("conv_5", "w"), nc) == 1
    assert unfreeze_stage(("conv_0", "w"), nc) == 6
    # embeddings at the final stage (utils/utils.py:148-150)
    assert unfreeze_stage(("lig_node_embedding", "emb"), nc) == 7
    assert unfreeze_stage(("rec_edge_embedding", "Dense_0", "kernel"), nc) == 7
    # batch norm never freezes (utils/utils.py:137-139)
    assert unfreeze_stage(("conv_0", "BatchNorm_0", "scale"), nc) == 0
    assert unfreeze_stage(("lig_emb_layers_0", "batch_norm", "bias"), nc) == 0


def test_scheduler_stage_and_ramp():
    s = LayerWarmupScheduler(num_conv_layers=2, warmup_dur=4,
                             lr_start_factor=0.001)
    # freeze window: 4 * (2 + 2) - 1 = 15 (reference train.py:38)
    assert s.total_warmup_epochs == 15
    stage0, scale0, changed0 = s.epoch_update(0)
    assert (stage0, changed0) == (0, True)
    assert scale0 == pytest.approx(0.001)
    stage1, scale1, changed1 = s.epoch_update(1)
    assert (stage1, changed1) == (0, False)
    assert 0.001 < scale1 < 1.0
    # reference timing: stage k begins when (epoch+1) % warmup_dur == 0,
    # i.e. at epoch k*warmup_dur - 1 (train.py:45-47), ramp restarts
    stage3, scale3, changed3 = s.epoch_update(3)
    assert (stage3, changed3) == (1, True)
    assert scale3 == pytest.approx(0.001)
    stage4, scale4, changed4 = s.epoch_update(4)
    assert (stage4, changed4) == (1, False)
    assert 0.001 < scale4 < 1.0
    # final stage covers embeddings, then caps
    stage12, _, _ = s.epoch_update(12)
    assert stage12 == 3
    # at the handoff epoch the optimizer is recreated at FULL lr
    # (utils/utils.py:152-164): scale must be exactly 1.0, not the last
    # ramp value (advisor r2 medium finding)
    _, scale15, _ = s.epoch_update(15)
    assert scale15 == 1.0
    stage99, scale99, _ = s.epoch_update(99)
    assert stage99 == 3 and scale99 == 1.0


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_masked_train_step_freezes_params():
    """With a stage-0 mask, head params move and frozen conv/embedding
    params stay bit-identical after a train step."""
    from diffdock_tpu.data.complexes import synthetic_complex
    from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
    from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
    from diffdock_tpu.models.config import ScoreModelConfig
    from diffdock_tpu.models.score_model import CGScoreModel
    from diffdock_tpu.train.trainer import (
        TrainConfig, create_train_state, make_train_step,
        training_model_config,
    )

    so3 = get_so3_tables(SO3Config(n_eps=64, x_n=256, l_max=512))
    torus = get_torus_tables(TorusConfig(x_n=256, sigma_n=128,
                                         mc_samples=2000))
    cfg = training_model_config(
        ScoreModelConfig(ns=8, nv=2, num_conv_layers=2,
                         num_prot_emb_layers=0),
        data_parallel=False,
    )
    model = CGScoreModel(cfg)
    rng = np.random.RandomState(0)
    datas = [
        jax.tree.map(
            jnp.asarray,
            synthetic_complex(rng, n_lig=8, n_rec=16, n_bonds=2),
        )
        for _ in range(2)
    ]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
    tc = TrainConfig(lr=1e-2)
    state = create_train_state(model, datas[0], so3, torus, tc,
                               jax.random.PRNGKey(0))
    mask = layer_warmup_mask(state.params, stage=0,
                             num_conv_layers=cfg.num_conv_layers)
    state = state.replace(param_mask=mask)
    step = jax.jit(make_train_step(model, tc, so3, torus))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    old = traverse_util.flatten_dict(state.params)
    new = traverse_util.flatten_dict(new_state.params)
    flat_mask = traverse_util.flatten_dict(mask)
    moved = frozen_ok = trained_moved = 0
    for path, m in flat_mask.items():
        changed = not np.array_equal(np.asarray(old[path]),
                                     np.asarray(new[path]))
        if float(m) == 0.0:
            assert not changed, f"frozen param moved: {path}"
            frozen_ok += 1
        elif changed:
            trained_moved += 1
        moved += changed
    assert frozen_ok > 0, "mask froze nothing — grouping is broken"
    assert trained_moved > 0, "no trainable param moved"
    # stage 0 must include the score heads
    head_path = next(p for p in flat_mask if p[0] == "final_conv")
    assert float(flat_mask[head_path]) == 1.0


@pytest.mark.slow
def test_train_cli_layer_linear_warmup(tmp_path):
    from diffdock_tpu.cli.train import main

    run = tmp_path / "run"
    rc = main([
        "--synthetic", "4", "--batch_size", "2", "--n_epochs", "3",
        "--model_preset", "diffdock_s", "--ns", "8", "--nv", "2",
        "--num_conv_layers", "2", "--num_prot_emb_layers", "0",
        "--scheduler", "layer_linear_warmup", "--warmup_dur", "1",
        "--log_dir", str(run),
    ])
    assert rc == 0
    # the full checkpoint-flavor zoo (reference train.py:105-146)
    for flavor in ("last_model", "last_ema_model", "best_model",
                   "best_ema_model"):
        assert (run / f"{flavor}.msgpack").exists(), flavor


def test_sampler_num_steps_clamped_to_schedule():
    """Shortening --inference_steps without --actual_steps must not produce
    a scan length mismatch (regression: scan got 2, 2, 19)."""
    from diffdock_tpu.inference.sampler import SamplerConfig

    cfg = SamplerConfig(inference_steps=2)  # actual_steps default 19
    assert cfg.num_steps == 2
    assert SamplerConfig(inference_steps=20, actual_steps=19).num_steps == 19
    assert SamplerConfig(inference_steps=20, actual_steps=None).num_steps == 20


def test_metrics_writer(tmp_path):
    import json

    from diffdock_tpu.utils.logging import MetricsWriter

    path = str(tmp_path / "run" / "metrics.jsonl")
    w = MetricsWriter(path)
    w.log(0, "train", loss=1.5, steps=10)
    w.log(0, "val_inference", valinf_min_rmsds_lt2=0.25, note="ok")
    w.close()
    recs = [json.loads(l) for l in open(path)]
    assert recs[0] == {"step": 0, "phase": "train", "loss": 1.5, "steps": 10.0}
    assert recs[1]["valinf_min_rmsds_lt2"] == 0.25
    assert recs[1]["note"] == "ok"
    # no-op writer needs no guards
    MetricsWriter(None).log(1, "train", loss=0.0)
