"""Mid-fit checkpoint/resume for long-running calibrations.

The reference has NO mid-fit persistence (SURVEY.md §5): endpoint-only
writes of model/resid/gains files. Full-array fits (350 ants x 1536
channels x many times) run for hours, so this framework checkpoints the
complete optimizer state — (params, opt_state, step, best-so-far, loss
history) — between jit-compiled segments of the descent, using orbax (the
TPU-native checkpoint library) with a numpy fallback.

Checkpoints are written per (pol, time) fit under
``{dir}/poltime_{tag}/step_{n}``; resuming an interrupted run restores the
latest step and continues the while_loop exactly where it stopped.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, NamedTuple

import jax
import numpy as np


class FitCheckpoint(NamedTuple):
    params: Any
    opt_state: Any
    step: int
    prev_loss: float
    best_loss: float
    best_params: Any
    history: np.ndarray  # losses recorded so far (host array)


def _leaf_paths(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def _orbax_state(ckpt: FitCheckpoint):
    return {
        "params": ckpt.params,
        "opt_state": ckpt.opt_state,
        "best_params": ckpt.best_params,
        "step": np.asarray(int(ckpt.step)),
        "prev_loss": np.asarray(float(ckpt.prev_loss)),
        "best_loss": np.asarray(float(ckpt.best_loss)),
        "history": np.asarray(ckpt.history, dtype=np.float64),
    }


def save_checkpoint(path, ckpt: FitCheckpoint):
    """Persist a FitCheckpoint: orbax (the TPU-native checkpoint library)
    when importable, numpy+pickle otherwise.

    Overwrites an existing checkpoint at ``path`` atomically: the state is
    written to a ``.tmp`` sibling first and os.rename'd over the final
    name only after a complete save. A crash mid-save therefore never
    leaves a present-but-unloadable step directory for latest_checkpoint
    to prefer (a rerun into an existing checkpoint_dir lands on the same
    step paths, and resuming from a half-written one would either raise or
    silently restore old-run state)."""
    import shutil

    path = os.path.abspath(path)
    tmp = path + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(tmp, "orbax"), _orbax_state(ckpt))
        ckptr.wait_until_finished()
    except ImportError:
        os.makedirs(tmp, exist_ok=True)
        state = {
            "params": ckpt.params,
            "opt_state": ckpt.opt_state,
            "best_params": ckpt.best_params,
        }
        scalars = {
            "step": int(ckpt.step),
            "prev_loss": float(ckpt.prev_loss),
            "best_loss": float(ckpt.best_loss),
            "history": np.asarray(ckpt.history, dtype=np.float64),
        }
        leaves, treedef = _leaf_paths(state)
        np.savez(
            os.path.join(tmp, "state.npz"),
            **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
            **scalars,
        )
        with open(os.path.join(tmp, "treedef.pkl"), "wb") as f:
            pickle.dump(treedef, f)
    # tmp now holds a complete checkpoint; swap it in. The only non-atomic
    # window (old removed, new still at .tmp) degrades to resuming from the
    # previous step — latest_checkpoint never sees a partial save because
    # "step_N.tmp" fails its int() parse.
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def load_checkpoint(path, like: FitCheckpoint) -> FitCheckpoint:
    """Restore a FitCheckpoint saved by save_checkpoint.

    ``like`` provides the pytree structure/dtypes to restore into."""
    orbax_path = os.path.abspath(os.path.join(path, "orbax"))
    if os.path.isdir(orbax_path):
        import warnings

        import jax.numpy as jnp
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            # untargeted restore: the history length varies between
            # checkpoints, so a typed target cannot be provided; structure
            # is re-validated against ``like`` below
            restored = ckptr.restore(orbax_path)

        def into(like_tree, restored_tree, name):
            # orbax restores tuples as lists; re-unflatten into the
            # caller's structure and dtypes
            leaves = jax.tree_util.tree_leaves(restored_tree)
            like_leaves, treedef = jax.tree_util.tree_flatten(like_tree)
            if len(leaves) != len(like_leaves):
                raise ValueError(
                    f"checkpoint {name} does not match the current fit structure"
                )
            leaves = [
                jnp.asarray(leaf, dtype=ref.dtype)
                for leaf, ref in zip(leaves, like_leaves)
            ]
            return jax.tree_util.tree_unflatten(treedef, leaves)

        return FitCheckpoint(
            params=into(like.params, restored["params"], "params"),
            opt_state=into(like.opt_state, restored["opt_state"], "opt_state"),
            step=int(restored["step"]),
            prev_loss=float(restored["prev_loss"]),
            best_loss=float(restored["best_loss"]),
            best_params=into(like.best_params, restored["best_params"], "best_params"),
            history=np.asarray(restored["history"], dtype=np.float64),
        )
    data = np.load(os.path.join(path, "state.npz"), allow_pickle=False)
    with open(os.path.join(path, "treedef.pkl"), "rb") as f:
        treedef = pickle.load(f)
    n = len([k for k in data.files if k.startswith("leaf_")])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    like_state = {
        "params": like.params,
        "opt_state": like.opt_state,
        "best_params": like.best_params,
    }
    like_leaves, like_treedef = _leaf_paths(like_state)
    if like_treedef != treedef:
        raise ValueError("checkpoint structure does not match the current fit")
    import jax.numpy as jnp

    leaves = [
        jnp.asarray(leaf, dtype=ref.dtype) for leaf, ref in zip(leaves, like_leaves)
    ]
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return FitCheckpoint(
        params=state["params"],
        opt_state=state["opt_state"],
        step=int(data["step"]),
        prev_loss=float(data["prev_loss"]),
        best_loss=float(data["best_loss"]),
        best_params=state["best_params"],
        history=np.asarray(data["history"], dtype=np.float64),
    )


def _checkpoint_loadable(path):
    """True when ``path`` contains a complete save (orbax dir or npz pair)."""
    if os.path.isfile(os.path.join(path, "state.npz")) and os.path.isfile(
        os.path.join(path, "treedef.pkl")
    ):
        return True
    return os.path.isdir(os.path.join(path, "orbax"))


def latest_checkpoint(directory):
    """Path of the highest-step LOADABLE checkpoint under ``directory``, or
    None. Incomplete step dirs (e.g. from a crash predating the atomic-save
    scheme) are skipped rather than returned and failed on."""
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    for _, name in sorted(steps, reverse=True):
        path = os.path.join(directory, name)
        if _checkpoint_loadable(path):
            return path
    return None
