"""Checkpoint save/resume via orbax (reference §5.4: mmcv CheckpointHook +
runner.resume / load_checkpoint, apis/train.py:147-150).

Checkpoints hold {params, batch_stats, opt_state, step, meta}. ``load_weights``
is the weights-only path (reference --load-from); ``restore`` is full resume
(reference --resume-from).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        ocp = _ocp()
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, state, meta: Optional[Dict] = None):
        ocp = _ocp()
        payload = {
            'params': state.params,
            'batch_stats': state.batch_stats,
            'opt_state': state.opt_state,
            'step': np.asarray(state.step),
        }
        if meta:
            payload['meta'] = meta
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def _restore_subset(self, step: int, template: Dict):
        """StandardRestore with a SUBSET template: orbax rejects structure
        mismatches (a weights-only template vs an on-disk checkpoint that
        also holds opt_state/step/meta raises ValueError) unless
        partial_restore is requested; fall back for orbax builds without
        the flag by restoring everything and projecting. Either way the
        result is re-imposed onto the template's tree structure — orbax
        round-trips namedtuples (optax opt states) as plain dicts, which
        would break tx.update and sharding placement."""
        ocp = _ocp()
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(
                    template, partial_restore=True))
        except TypeError:   # older orbax: no partial_restore kwarg
            full = self._mgr.restore(step)
            restored = {k: full[k] for k in template}
        out = {}
        for k, tmpl in template.items():
            leaves = jax.tree_util.tree_leaves(restored[k])
            treedef = jax.tree_util.tree_structure(tmpl)
            if treedef.num_leaves == len(leaves):
                out[k] = jax.tree_util.tree_unflatten(treedef, leaves)
            else:
                out[k] = restored[k]
        return out

    def restore(self, state, step: Optional[int] = None):
        """Full resume: params + opt_state + step."""
        step = step if step is not None else self.latest_step()
        template = {
            'params': state.params,
            'batch_stats': state.batch_stats,
            'opt_state': state.opt_state,
            'step': np.asarray(state.step),
        }
        restored = self._restore_subset(step, template)
        return state.replace(
            params=restored['params'],
            batch_stats=restored['batch_stats'],
            opt_state=restored['opt_state'],
            step=jax.numpy.asarray(restored['step']))

    def save_weights(self, variables, step: int = 0,
                     meta: Optional[Dict] = None):
        """Weights-only save (params + batch_stats, no optimizer) — the
        artifact tools/convert_checkpoint.py publishes; readable by
        ``load_weights`` / init_recognizer / --load-from."""
        ocp = _ocp()
        payload = {
            'params': variables['params'],
            'batch_stats': variables.get('batch_stats', {}),
        }
        if meta:
            payload['meta'] = meta
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def load_weights(self, variables, step: Optional[int] = None):
        """Weights-only load (reference --load-from semantics)."""
        step = step if step is not None else self.latest_step()
        template = {
            'params': variables['params'],
            'batch_stats': variables.get('batch_stats', {}),
        }
        restored = self._restore_subset(step, template)
        out = dict(variables)
        out['params'] = restored['params']
        if restored.get('batch_stats'):
            out['batch_stats'] = restored['batch_stats']
        return out


def save_variables(path: str, variables):
    """Single-file .npz save for simple weight publishing
    (reference tools/publish_model.py analog)."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    arrays = {}
    for kpath, leaf in flat:
        name = '/'.join(getattr(p, 'key', str(p)) for p in kpath)
        arrays[name] = np.asarray(leaf)
    np.savez(path, **arrays)


def load_variables(path: str, variables):
    """Load a .npz produced by save_variables into a matching pytree."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
    leaves = []
    for kpath, leaf in flat:
        name = '/'.join(getattr(p, 'key', str(p)) for p in kpath)
        arr = data[name]
        assert arr.shape == leaf.shape, (name, arr.shape, leaf.shape)
        leaves.append(jax.numpy.asarray(arr, leaf.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(variables), leaves)
