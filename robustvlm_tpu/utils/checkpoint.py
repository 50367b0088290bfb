"""Checkpointing: orbax for native state, torch-layout export for ecosystem interop.

Implements the reference's checkpoint policy (SURVEY.md §5; reference
adversarial_training_clip.py:467-479): N evenly spaced snapshots with optimizer
state, a rolling `fallback_<step>` pair every 200 steps (older fallbacks
removed), and a `final` checkpoint — plus resume. Visual weights can
additionally be exported as a torch-layout `.pt` readable by the reference's
`load_clip_model` (eval_utils.py:30-61), so models trained here drop into the
upstream eval stack unchanged.
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path
from typing import Any, Optional

import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except ImportError:  # pragma: no cover
    _HAS_ORBAX = False

from robustvlm_tpu.models.clip.import_torch import export_visual_state_dict


class CheckpointManager:
    def __init__(self, output_dir: str, total_steps: int, n_snapshots: int = 10,
                 fallback_every: int = 200):
        self.dir = Path(output_dir) / "checkpoints"
        self.dir.mkdir(parents=True, exist_ok=True)
        self.total_steps = total_steps
        self.snapshot_every = max(total_steps // n_snapshots, 1)
        self.fallback_every = fallback_every
        self._ckptr = ocp.StandardCheckpointer() if _HAS_ORBAX else None

    # -------------------------------------------------------------- orbax io
    def _save_tree(self, path: Path, tree: Any):
        if path.exists():
            shutil.rmtree(path)
        if self._ckptr is not None:
            self._ckptr.save(path.resolve(), tree)
            self._ckptr.wait_until_finished()
        else:
            import pickle

            path.mkdir(parents=True)
            with (path / "state.pkl").open("wb") as f:
                pickle.dump(tree, f)

    def _load_tree(self, path: Path, like: Any) -> Any:
        if self._ckptr is not None:
            return self._ckptr.restore(path.resolve(), like)
        import pickle

        with (path / "state.pkl").open("rb") as f:
            return pickle.load(f)

    # ---------------------------------------------------------------- policy
    def maybe_save(self, step: int, params, opt_state) -> None:
        if step % self.snapshot_every == 0:
            self._save_tree(self.dir / f"step_{step}", {"params": params})
            self._save_tree(self.dir / f"step_{step}_opt", {"opt": opt_state})
        if step % self.fallback_every == 0:
            self._save_tree(self.dir / f"fallback_{step}", {"params": params})
            self._save_tree(self.dir / f"fallback_{step}_opt", {"opt": opt_state})
            for p in self.dir.glob("fallback_*"):
                m = re.match(r"fallback_(\d+)", p.name)
                if m and int(m.group(1)) != step:
                    shutil.rmtree(p, ignore_errors=True)

    def save_final(self, params, opt_state) -> None:
        self._save_tree(self.dir / "final", {"params": params})
        self._save_tree(self.dir / "final_opt", {"opt": opt_state})

    def restore(self, name: str, params_like, opt_like=None):
        params = self._load_tree(self.dir / name, {"params": params_like})["params"]
        opt = None
        if opt_like is not None and (self.dir / f"{name}_opt").exists():
            opt = self._load_tree(self.dir / f"{name}_opt", {"opt": opt_like})["opt"]
        return params, opt

    # ------------------------------------------------------- torch interop
    def export_torch_visual(self, params, clip_cfg, name: str = "final.pt") -> Path:
        """Write the visual tower as a torch state dict .pt (reference format)."""
        import torch

        sd = export_visual_state_dict(params["visual"], clip_cfg)
        out = self.dir / name
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, out)
        return out
