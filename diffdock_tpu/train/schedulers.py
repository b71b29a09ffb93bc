"""Progressive layer-unfreezing warmup (reference ``layer_linear_warmup``,
``utils/utils.py:131-169`` + ``train.py:35-58``) — the scheduler used to
fine-tune DiffDock-L from a pretrained checkpoint.

Reference semantics, re-expressed for jitted training:

- stage 0 (epochs ``[0, warmup_dur)``): only the score heads train
  (center_edge_embedding, final_conv, tr/rot/tor final layers,
  final_edge_embedding, final_tp_tor, tor_bond_conv); batch-norm parameters
  are never frozen.
- stage ``s`` in ``1..num_conv_layers``: conv layer ``num_conv_layers - s``
  additionally unfreezes (top conv layer first).
- stage ``num_conv_layers + 1``: the node/edge embeddings (and anything
  else) unfreeze; after ``warmup_dur*(num_conv_layers+2)-1`` epochs the
  plateau scheduler takes over (``train.py:38``).
- within every stage the LR ramps linearly ``lr_start_factor -> 1``
  over ``warmup_dur`` epochs (torch ``LinearLR``).
- each stage transition recreates the optimizer, i.e. resets Adam moments
  (``utils/utils.py:152-153``).

Freezing is realized TPU-natively as a 0/1 scalar per parameter leaf
multiplied into the Adam updates (``TrainState.param_mask``) — mask values
are traced inputs, so stage changes recompile nothing.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Tuple

import jax.numpy as jnp
from flax import traverse_util

# score-head modules trainable from stage 0
# (reference utils/utils.py:140-142)
HEAD_MODULES = frozenset({
    "center_edge_embedding", "final_conv", "tr_final_layer",
    "rot_final_layer", "final_edge_embedding", "final_tp_tor",
    "tor_bond_conv", "tor_final_dense1", "tor_final_dense2",
})
# embedding modules released at the final warmup stage
# (reference utils/utils.py:148-150)
_CONV_RE = re.compile(r"^conv_(\d+)$")


def unfreeze_stage(path: Tuple[str, ...], num_conv_layers: int) -> int:
    """Smallest warmup stage at which the parameter at ``path`` trains."""
    if any("batch_norm" in p.lower() or "batchnorm" in p.lower()
           for p in path):
        return 0  # BN is never frozen (utils/utils.py:137-139)
    top = path[0]
    if top in HEAD_MODULES:
        return 0
    m = _CONV_RE.match(top)
    if m:
        return num_conv_layers - int(m.group(1))
    # embeddings and everything else release last
    return num_conv_layers + 1


def layer_warmup_mask(params: Any, stage: int, num_conv_layers: int) -> Any:
    """0/1 scalar mask pytree matching ``params``: 1 where the leaf trains
    at ``stage``."""
    flat = traverse_util.flatten_dict(params)
    mask = {
        path: jnp.asarray(
            1.0 if unfreeze_stage(path, num_conv_layers) <= stage else 0.0,
            jnp.float32,
        )
        for path in flat
    }
    return traverse_util.unflatten_dict(mask)


@dataclasses.dataclass
class LayerWarmupScheduler:
    """Host-side stage/LR controller. Call ``epoch_update(epoch)`` at the
    start of every epoch; apply the returned mask stage + LR scale to the
    train state (resetting ``opt_state`` when ``stage_changed``)."""

    num_conv_layers: int
    warmup_dur: int = 4
    lr_start_factor: float = 0.001
    _stage: int = dataclasses.field(default=-1, init=False)

    @property
    def total_warmup_epochs(self) -> int:
        # reference train.py:38 freeze_params
        return self.warmup_dur * (self.num_conv_layers + 2) - 1

    def epoch_update(self, epoch: int) -> Tuple[int, float, bool]:
        """Returns (stage, lr_scale, stage_changed).

        Reference timing (train.py:45-53): a stage transition fires at the
        top of epoch ``e`` when ``(e+1) % warmup_dur == 0``, i.e. stage ``k``
        begins at epoch ``k*warmup_dur - 1`` (stage 0 spans ``warmup_dur-1``
        epochs, every later stage spans ``warmup_dur``). From epoch
        ``total_warmup_epochs`` on, the optimizer is recreated at FULL lr
        and the plateau scheduler takes over — the ramp never leaks past
        warmup (utils/utils.py:152-164).
        """
        stage = min((epoch + 1) // self.warmup_dur, self.num_conv_layers + 1)
        changed = stage != self._stage
        self._stage = stage
        if epoch >= self.total_warmup_epochs:
            return stage, 1.0, changed
        # torch LinearLR: factor ramps start->1 over warmup_dur scheduler
        # steps within the current stage (recreated per stage)
        start = 0 if stage == 0 else stage * self.warmup_dur - 1
        k = min(epoch - start, self.warmup_dur)
        frac = k / max(self.warmup_dur, 1)
        scale = self.lr_start_factor + (1.0 - self.lr_start_factor) * frac
        return stage, scale, changed
