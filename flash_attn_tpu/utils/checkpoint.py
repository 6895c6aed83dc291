"""Checkpoint / resume for training runs (Orbax-backed).

The reference has no checkpoint story at all (SURVEY.md §5: the closest
analog is the RNG-state save/restore protocol inside autograd, which our
kernels already mirror by keying dropout on a saved seed). Large-scale TPU
training needs a real one: preemptible TPU slices make mid-run restarts
the common case, not the exception.

TPU-native design notes:
  - Orbax writes/reads ``jax.Array``s with their shardings, so the same
    code path covers single-chip and multi-host pjit runs (each host
    writes its own shards; restore honors a sharded abstract template).
  - Saves are asynchronous by default: the train loop keeps stepping
    while the previous checkpoint drains to disk; ``close()`` (or the
    context manager) blocks until everything is durable.
  - ``restore`` takes the live (or abstract) train-state pytree as a
    template so optax's NamedTuple opt-state structure round-trips
    exactly; without a template Orbax would hand back plain nested dicts.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _abstractify(tree):
    """Live pytree -> abstract (ShapeDtypeStruct) pytree, keeping
    shardings so multi-host restores place shards on the right devices."""

    def one(x):
        if isinstance(x, jax.Array):
            sharding = getattr(x, "sharding", None)
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        if isinstance(x, jax.ShapeDtypeStruct):
            return x
        return x  # python scalars / None round-trip as-is

    return jax.tree_util.tree_map(one, tree)


class TrainCheckpointer:
    """Manages a directory of numbered train-state checkpoints.

    >>> ckpt = TrainCheckpointer("/path/run1", max_to_keep=3)
    >>> step, params, opt_state = ckpt.resume_or_init(init_fn)
    >>> for step in range(step, total):
    ...     params, opt_state, loss = train_step(...)
    ...     ckpt.save(step + 1, params, opt_state)
    >>> ckpt.close()

    ``save`` is async (non-blocking); at most ``max_to_keep`` checkpoints
    are retained, plus every multiple of ``keep_period`` if set.
    """

    def __init__(
        self,
        directory,
        *,
        max_to_keep: int = 3,
        keep_period: Optional[int] = None,
        async_save: bool = True,
    ):
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            keep_period=keep_period,
            enable_async_checkpointing=async_save,
        )
        self._mngr = ocp.CheckpointManager(directory, options=opts)

    # -- writing ---------------------------------------------------------

    def save(self, step: int, params, opt_state, **extra) -> bool:
        """Queue an async save of the full train state at ``step``.

        ``extra`` entries must be pytrees of arrays / scalars (e.g.
        ``rng_key=key, ema=ema_params``). Returns False if the manager
        decided to skip this step (save_interval policies)."""
        tree = {"params": params, "opt_state": opt_state, "extra": extra}
        return self._mngr.save(step, args=ocp.args.StandardSave(tree))

    # -- reading ---------------------------------------------------------

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def all_steps(self):
        return self._mngr.all_steps()

    def restore(self, params, opt_state, step: Optional[int] = None, **extra):
        """Restore ``step`` (default: latest) into the structure of the
        given train state. The arguments are templates — live arrays or
        ``jax.ShapeDtypeStruct``s (with shardings for pjit runs); their
        values are not read. Returns ``(step, params, opt_state, extra)``.
        """
        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint found under {self._mngr.directory}"
            )
        template = _abstractify(
            {"params": params, "opt_state": opt_state, "extra": extra}
        )
        tree = self._mngr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        return step, tree["params"], tree["opt_state"], tree["extra"]

    def resume_or_init(self, init_fn, **extra_template):
        """Resume from the latest checkpoint, or initialize fresh.

        ``init_fn() -> (params, opt_state)`` runs only when no checkpoint
        exists (step 0). Otherwise its outputs are still used as the
        restore template via ``jax.eval_shape`` — so on resume no fresh
        parameter memory is materialized. Returns
        ``(step, params, opt_state)`` (or ``(step, params, opt_state,
        extra)`` when an ``extra_template`` is given)."""
        step = self.latest_step()
        if step is None:
            params, opt_state = init_fn()
            if extra_template:
                return 0, params, opt_state, extra_template
            return 0, params, opt_state
        abstract = jax.eval_shape(init_fn)
        step, params, opt_state, extra = self.restore(
            abstract[0], abstract[1], step=step, **extra_template
        )
        if extra_template:
            return step, params, opt_state, extra
        return step, params, opt_state

    # -- lifecycle -------------------------------------------------------

    def wait(self):
        """Block until queued async saves are durable on disk."""
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
