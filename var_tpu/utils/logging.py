"""Logging / metrics / observability.

Rebuilds the reference's observability stack (``utils/misc.py:54-381``,
``utils/arg_util.py:177-196``) with the same scalar names so dashboards
stay comparable:

* timestamped, source-located, master-gated ``log()`` (vs the reference's
  builtin-print monkeypatch, misc.py:54-75 — we keep ``print`` intact).
* ``SmoothedValue`` / ``MetricLogger`` windowed meters with ETA.
* ``TensorboardLogger`` via tensorboardX when available (no-op otherwise).
* one JSON-ish status line per epoch appended to ``log.txt``
  (``arg_util.dump_log``).
* ``create_npz_from_sample_folder`` for the FID protocol
  (``misc.py:360-381``).
"""

from __future__ import annotations

import datetime
import inspect
import json
import os
from collections import deque
from typing import Optional, Tuple

import numpy as np


def is_master() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def log(*args, force: bool = False):
    """Timestamp + file:line prefixed print, master-only unless force."""
    if not (is_master() or force):
        return
    frame = inspect.stack()[1]
    src = f"{os.path.basename(frame.filename)}:{frame.lineno}"
    ts = datetime.datetime.now().strftime("%m-%d %H:%M:%S")
    print(f"[{ts}] ({src:>20s}) =>", *args, flush=True)


def tee_output(out_dir: str) -> None:
    """Tee stdout/stderr to ``{out_dir}/stdout.txt`` / ``stderr.txt``
    (reference ``SyncPrint``, misc.py:78-112) — line-buffered, append mode
    so restarted runs keep one continuous log."""
    import sys

    os.makedirs(out_dir, exist_ok=True)

    class _Tee:
        def __init__(self, stream, path):
            self.stream = stream
            self.f = open(path, "a", buffering=1)

        def write(self, s):
            self.stream.write(s)
            self.f.write(s)

        def flush(self):
            self.stream.flush()
            self.f.flush()

        def isatty(self):
            return False

    sys.stdout = _Tee(sys.stdout, os.path.join(out_dir, "stdout.txt"))
    sys.stderr = _Tee(sys.stderr, os.path.join(out_dir, "stderr.txt"))


class SmoothedValue:
    """Windowed median/avg meter (reference ``misc.py:183-249``)."""

    def __init__(self, window_size: int = 30, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        value = float(value)
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def eta(self, n_remaining: int) -> Tuple[str, str]:
        """("H:MM:SS left", "finishes at YYYY-mm-dd HH:MM") from the
        windowed median per-item time."""
        secs = self.median * n_remaining
        left = str(datetime.timedelta(seconds=int(round(secs))))
        done_at = datetime.datetime.now() + datetime.timedelta(seconds=secs)
        return left, done_at.strftime("%Y-%m-%d %H:%M")

    def __str__(self):
        stats = dict(median=self.median, avg=self.avg, global_avg=self.global_avg,
                     value=self.value, max=max(self.deque, default=0.0))
        return self.fmt.format(**stats)


class MetricLogger:
    """Iteration logger with meters + ETA (reference ``misc.py:252-337``)."""

    def __init__(self, delimiter: str = "  "):
        self.meters: dict = {}
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            if v is None:
                continue
            self.meters.setdefault(k, SmoothedValue()).update(float(v))

    def __str__(self):
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def eta(self, meter: str, n_remaining: int) -> str:
        """ETA string from the named per-step-seconds meter (the reference
        interleaves this into its iteration log lines, misc.py:303-307)."""
        if meter not in self.meters:
            return "?"
        left, finish = self.meters[meter].eta(n_remaining)
        return f"ETA {left} ({finish})"


class TensorboardLogger:
    """tensorboardX scalar logger; silently no-ops when the package or the
    master role is absent (reference DistLogger + TensorboardLogger,
    ``misc.py:115-180``)."""

    def __init__(self, log_dir: str, enabled: Optional[bool] = None):
        self.enabled = is_master() if enabled is None else enabled
        self.writer = None
        self.step = 0
        if self.enabled:
            try:
                from tensorboardX import SummaryWriter

                os.makedirs(log_dir, exist_ok=True)
                self.writer = SummaryWriter(log_dir)
            except ImportError:
                self.enabled = False

    def set_step(self, step: Optional[int] = None):
        if step is not None:
            self.step = step

    def update(self, head: str = "scalar", step: Optional[int] = None, **kwargs):
        if not self.writer:
            return
        s = self.step if step is None else step
        for k, v in kwargs.items():
            if v is None:
                continue
            self.writer.add_scalar(f"{head}/{k}", float(v), s)

    def log_tensor_as_distri(self, tag: str, tensor, step: Optional[int] = None):
        """Histogram of a tensor's values (reference ``misc.py:155-165``)."""
        if not self.writer:
            return
        self.writer.add_histogram(tag, np.asarray(tensor, np.float32).ravel(),
                                  self.step if step is None else step)

    def log_image(self, tag: str, img_chw, step: Optional[int] = None):
        """CHW image in [0, 1] (reference ``misc.py:167-174``)."""
        if not self.writer:
            return
        self.writer.add_image(tag, np.asarray(img_chw),
                              self.step if step is None else step)

    def flush(self):
        if self.writer:
            self.writer.flush()

    def close(self):
        if self.writer:
            self.writer.close()


def dump_log_line(args, **stats):
    """Append one dict-repr line per epoch to log.txt (arg_util.py:177-196)."""
    if not is_master():
        return
    first = stats.pop("_first", False)
    if first:
        with open(args.log_txt_path, "w") as f:
            json.dump({"name": args.exp_name, "cmd": "", "tb_log_dir_path": args.tb_log_dir_path}, f)
            f.write("\n")
    with open(args.log_txt_path, "a") as f:
        f.write(f"{stats}\n")


def create_npz_from_sample_folder(sample_dir: str, num: int = 50_000) -> str:
    """Pack PNG samples into the OpenAI-evaluator npz (``misc.py:360-381``)."""
    from PIL import Image

    samples = []
    for i in range(num):
        img = np.asarray(Image.open(os.path.join(sample_dir, f"{i:06d}.png")))
        assert img.shape == (img.shape[0], img.shape[0], 3)
        samples.append(img)
    arr = np.stack(samples)
    npz_path = f"{sample_dir}.npz"
    np.savez(npz_path, arr_0=arr)
    print(f"Saved .npz file to {npz_path} [shape={arr.shape}]")
    return npz_path


class ProfilerHooks:
    """jax.profiler trace wrapper (SURVEY.md §5 tracing row): enable with
    VAR_TPU_PROFILE_DIR=<dir>, traces a step window for tensorboard-profile."""

    def __init__(self, out_dir: Optional[str] = None, start_step: int = 10, num_steps: int = 5):
        self.out_dir = out_dir or os.environ.get("VAR_TPU_PROFILE_DIR")
        self.start, self.stop = start_step, start_step + num_steps
        self._active = False

    def maybe_toggle(self, step: int):
        if not self.out_dir:
            return
        import jax

        if step == self.start and not self._active:
            jax.profiler.start_trace(self.out_dir)
            self._active = True
        elif step >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
