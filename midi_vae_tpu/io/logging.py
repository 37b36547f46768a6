"""Metrics logging and observability (reference: C11, ``train.py:246-302,469-496,608-759``).

Reference-compatible metric namespaces (``training/stepwise/*``,
``training/epochwise/*``, ``eval/{test,val,train}/*``) so dashboards
carry over. Backends:

- console (epoch summaries and step lines in the reference's formats,
  train.py:401-414, 704-711)
- JSONL file (``metrics.jsonl`` in the model dir) — always-on local
  observability the reference lacks without wandb
- wandb, lazily imported and optional (train.py:28-30), with run-id
  persistence for preemption resume (``wandb_runid.txt``,
  utils.py:41-80)

Phase-duration timing (train.py:630-669) is host wall-clock around the
async dispatch boundaries plus ``block_until_ready`` at the log point —
the TPU equivalent of CUDA events + synchronize: between log intervals
the device runs free with zero timing overhead.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


def generate_id(length: int = 8) -> str:
    """Random base-36 run id (reference: utils.py:163-182)."""
    import secrets
    import string

    alphabet = string.ascii_lowercase + string.digits
    return "".join(secrets.choice(alphabet) for _ in range(length))


class PhaseTimer:
    """Wall-clock phase durations within a step loop (train.py:618-669).

    Call :meth:`mark` at each phase boundary; :meth:`durations` returns
    the seconds between consecutive marks under the reference's phase
    names (dataloader/forward-dispatch/logging/...).
    """

    def __init__(self):
        self._marks = []

    def mark(self, name: str) -> None:
        self._marks.append((name, time.perf_counter()))

    def durations(self) -> Dict[str, float]:
        out = {}
        for (name, t0), (_, t1) in zip(self._marks, self._marks[1:]):
            out[name] = out.get(name, 0.0) + (t1 - t0)
        return out

    def reset(self) -> None:
        self._marks.clear()


# Config keys never uploaded to wandb (reference: train.py:254-263's
# EXCLUDED_WANDB_CONFIG_KEYS): run identity lives in the run object itself,
# and logging/output plumbing is noise in a hyperparameter table.
EXCLUDED_WANDB_CONFIG_KEYS = frozenset(
    {
        "log_wandb",
        "wandb_entity",
        "wandb_project",
        "run_name",
        "run_id",
        "model_output_dir",
    }
)


class MetricLogger:
    """Fan-out metric logger: console + JSONL + optional wandb."""

    def __init__(
        self,
        output_dir: Optional[str] = None,
        *,
        use_wandb: bool = False,
        wandb_entity: Optional[str] = None,
        wandb_project: str = "midi_vae_tpu",
        run_name: Optional[str] = None,
        run_id: Optional[str] = None,
        config: Optional[Dict[str, Any]] = None,
        is_leader: bool = True,
        tags=(),
    ):
        self.output_dir = output_dir
        self.is_leader = is_leader
        self._jsonl = None
        self._wandb = None
        if not is_leader:
            return
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            self._jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a", buffering=1)
        if use_wandb:
            self._init_wandb(wandb_entity, wandb_project, run_name, run_id, config, tags)

    # -- wandb ------------------------------------------------------------
    def _init_wandb(self, entity, project, run_name, run_id, config, tags):
        try:
            import wandb
        except ImportError:
            print("wandb requested but not installed; falling back to JSONL-only logging")
            return
        resume_id = None
        id_file = os.path.join(self.output_dir, "wandb_runid.txt") if self.output_dir else None
        if id_file and os.path.isfile(id_file):
            with open(id_file) as f:
                resume_id = f.read().strip()  # preemption resume (utils.py:63-71)
        uploaded = {k: v for k, v in (config or {}).items() if k not in EXCLUDED_WANDB_CONFIG_KEYS}
        kwargs = dict(entity=entity, project=project, name=run_name, config=uploaded, tags=list(tags))
        if resume_id:
            # modern API: the run id rides `id=`, `resume="must"` asserts the
            # run exists (the legacy `resume=<id>` form is deprecated and
            # starts a FRESH run on current wandb versions, silently breaking
            # preemption resume)
            self._wandb = wandb.init(id=resume_id, resume="must", **kwargs)
        else:
            self._wandb = wandb.init(id=run_id, **kwargs)
            if id_file:
                with open(id_file, "w") as f:
                    f.write(self._wandb.id)

    @property
    def wandb_run(self):
        return self._wandb

    # -- logging ----------------------------------------------------------
    def log(self, metrics: Dict[str, Any], step: int) -> None:
        if not self.is_leader:
            return
        if self._jsonl:
            self._jsonl.write(json.dumps({"step": step, **metrics}, default=float) + "\n")
        if self._wandb:
            self._wandb.log(metrics, step=step)

    def log_namespaced(self, prefix: str, metrics: Dict[str, Any], step: int) -> None:
        self.log({f"{prefix}/{k}": v for k, v in metrics.items()}, step)

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
            self._jsonl = None
        if self._wandb:
            self._wandb.finish()
            self._wandb = None


def format_duration(seconds: float) -> str:
    """Reference's duration pretty-printing thresholds (train.py:405-412)."""
    if seconds > 172800:
        return f"{seconds / 86400:11.2f} days"
    if seconds > 5400:
        return f"{seconds / 3600:11.2f} hours"
    if seconds > 120:
        return f"{seconds / 60:11.2f} minutes"
    return f"{seconds:11.2f} seconds"


def print_epoch_summary(kind: str, epoch: int, n_epoch: int, stats: Dict[str, Any], duration: float) -> None:
    """Epoch roll-up in the reference's console format (train.py:401-414,430-440)."""
    print(f"\n{kind} epoch {epoch}/{n_epoch} summary:")
    for label, key in [("Total Steps", "total_step"), ("Steps", "steps"), ("Samples", "samples")]:
        if key in stats:
            print(f"  {label} {'.' * (19 - len(label))}{stats[key]:8d}")
    print(f"  Duration ...........{format_duration(duration)}")
    if "throughput" in stats:
        print(f"  Throughput .........{stats['throughput']:11.2f} samples/sec")
    if "loss" in stats:
        print(f"  Loss ...............{stats['loss']:14.5f}")
    if "cross-entropy" in stats:
        print(f"  Cross-entropy ......{stats['cross-entropy']:14.5f}")
