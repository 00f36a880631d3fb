"""Elastic training recovery: survive transient runtime/tunnel failures.

The reference has no failure handling at all — any worker exception kills
the run and restart means re-running the script by hand after uncommenting
the checkpoint-loading block (reference: train_nele.py:76-85; SURVEY §5
"Failure detection / elastic recovery: none").  Long TPU jobs here face a
concrete transient-failure source: the remote-compile/execute tunnel
occasionally drops a connection mid-call, surfacing as a JaxRuntimeError on
an otherwise healthy program.

`run_with_recovery` wraps the Trainer loop with bounded retries: on any
exception it rebuilds the Trainer from scratch (fresh device buffers — a
poisoned backend state does not leak across attempts), resumes from the
latest complete-state checkpoint (params + opt + RNG + epoch + replay, so
recovery is exact up to the failed epoch), and continues.  The persistent
XLA compilation cache (enabled inside Trainer) makes re-attempts cheap:
already-compiled program shapes reload instead of recompiling.
"""
from __future__ import annotations

import os
import time
import traceback
from typing import Callable, Optional


def run_with_recovery(make_trainer: Callable[[], "Trainer"],
                      epochs: Optional[int] = None,
                      max_retries: int = 5,
                      backoff_seconds: float = 20.0,
                      verbose_timing: bool = False):
    """Run a Trainer to completion, rebuilding + resuming on failures.

    Args:
      make_trainer: zero-arg factory producing a fresh Trainer (fresh
        factories matter: device buffers from a failed attempt must not be
        reused).
      epochs: forwarded to Trainer.run.
      max_retries: failed attempts allowed *beyond* the first.
    Returns:
      the (last) Trainer instance after a successful run.
    Raises:
      the final exception if every attempt fails.
    """
    last_exc: Optional[BaseException] = None
    for attempt in range(max_retries + 1):
        try:
            # the factory runs inside the retry too: backend/device init is
            # itself a transient-failure site after a tunnel drop
            trainer = make_trainer()
            latest = os.path.join(trainer.paths.checkpoints, "latest")
            if attempt > 0 and os.path.exists(latest):
                trainer.resume(truncate_log=True)
                print(f"[recovery] attempt {attempt + 1}: resumed at epoch "
                      f"{trainer.start_epoch}", flush=True)
            trainer.run(epochs, verbose_timing=verbose_timing)
            return trainer
        except KeyboardInterrupt:
            raise
        except Exception as exc:  # noqa: BLE001 — transient runtime faults
            last_exc = exc
            traceback.print_exc()
            print(f"[recovery] attempt {attempt + 1} failed "
                  f"({type(exc).__name__}); retrying in "
                  f"{backoff_seconds:.0f}s", flush=True)
            time.sleep(backoff_seconds)
    raise last_exc
