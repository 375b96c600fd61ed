"""Orbax checkpointing with the reference's three-checkpoint policy.

Equivalent of the ``torch.save`` payloads and policy in
``training/train_loop.py:84-130`` and the resume logic in
``main.py:124-139``:

* rolling ``checkpoint`` every epoch + ``checkpoint{epoch:04}`` every
  50 epochs;
* ``checkpoint_lowest_val_loss`` on new best validation loss;
* ``checkpoint_top_res`` on new best validation accuracy;
* payload = train state (params / optimizer / batch stats / AIMLE
  state / step) + epoch + the full config JSON (the reference persists
  ``args`` and rebuilds the model from them,
  ``run_token_coo.py:29-45``);
* writes happen on the main process only (``save_on_master``,
  ``utils/misc.py:384-386``).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from ..config import Config
from ..parallel.mesh import is_main_process
from .state import TrainState


class CheckpointManager:
    def __init__(self, output_dir: str):
        self.output_dir = os.path.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.output_dir, name)

    def save(self, name: str, state: TrainState, epoch: int, cfg: Config,
             _host_state=None):
        if not is_main_process():
            return
        path = self._path(name)
        host_state = _host_state if _host_state is not None \
            else jax.device_get(state)
        self._ckpt.save(path, host_state, force=True)
        with open(path + ".meta.json", "w") as f:
            json.dump({"epoch": epoch, "config": json.loads(cfg.to_json())}, f)
        self._ckpt.wait_until_finished()

    def save_policy(self, state: TrainState, epoch: int, cfg: Config,
                    val_loss: float, val_acc: float,
                    best_loss: float, best_acc: float) -> Tuple[float, float]:
        """Apply the reference's checkpoint policy; returns updated
        (best_loss, best_acc).  The device->host transfer happens once
        per epoch and is shared by all checkpoints written."""
        host_state = jax.device_get(state) if is_main_process() else None
        if val_loss < best_loss:                      # train_loop.py:84-96
            best_loss = val_loss
            self.save("checkpoint_lowest_val_loss", state, epoch, cfg,
                      _host_state=host_state)
        if val_acc > best_acc:                        # train_loop.py:98-110
            best_acc = val_acc
            self.save("checkpoint_top_res", state, epoch, cfg,
                      _host_state=host_state)
        self.save("checkpoint", state, epoch, cfg,    # train_loop.py:115-130
                  _host_state=host_state)
        if (epoch + 1) % 50 == 0:
            self.save(f"checkpoint{epoch:04d}", state, epoch, cfg,
                      _host_state=host_state)
        return best_loss, best_acc

    def restore(self, name: str, target: TrainState, model_only: bool = False
                ) -> Tuple[TrainState, int, Optional[Config]]:
        """Resume (main.py:124-139): restores the state; returns
        (state, next_start_epoch, checkpointed config).

        ``model_only`` restores params/batch-stats/AIMLE state but not
        the optimizer — the reference's eval-time behavior
        (main.py:131: optimizer/scheduler only when not evaluating).
        This also tolerates optimizer-structure drift across versions.
        """
        path = name if os.path.isabs(name) else self._path(name)
        if model_only:
            raw = self._ckpt.restore(path)
            replacements = dict(params=raw["params"],
                                batch_stats=raw["batch_stats"])
            if target.aimle_states is not None and raw.get("aimle_states"):
                replacements["aimle_states"] = jax.tree_util.tree_map(
                    lambda t, r: r, target.aimle_states, raw["aimle_states"])
            state = target.replace(**replacements)
        else:
            state = self._ckpt.restore(path, target=jax.device_get(target))
        epoch, cfg = -1, None
        meta_path = path + ".meta.json"
        if os.path.isfile(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            epoch = meta.get("epoch", -1)
            cfg = Config.from_json(json.dumps(meta.get("config", {})))
        return state, epoch + 1, cfg
