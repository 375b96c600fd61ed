"""Cross-process metric aggregation and rich logging.

Equivalents of the reference's ``utils/misc.py`` distributed helpers:

* :class:`SmoothedValue` — windowed meter with cross-process
  synchronization (``misc.py:22-82``; the ``all_reduce`` at ``:40-51``
  becomes a ``process_allgather`` sum);
* :func:`reduce_dict` — average a dict of scalars across processes
  (``misc.py:130-154``);
* :func:`all_gather_objects` — gather arbitrary picklable objects
  (``misc.py:85-127``);
* :class:`MetricLogger` — iteration logger with ETA and device-memory
  readout (``misc.py:157-262``).

In single-process runs every collective degrades to the identity, so
the same code path serves 1 host or many.
"""

from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Dict, Iterable, List

import jax
import numpy as np


def _allgather_array(x: np.ndarray) -> np.ndarray:
    """Gather a small host array from every process (host-side)."""
    if jax.process_count() == 1:
        return x[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x))


class SmoothedValue:
    """Track a series of values with windowed smoothing
    (``misc.py:22-82``)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self):
        """Sum count/total across processes (``misc.py:40-51``)."""
        gathered = _allgather_array(
            np.asarray([self.count, self.total], np.float64))
        summed = gathered.sum(axis=0)
        self.count = int(summed[0])
        self.total = float(summed[1])

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return float(np.max(self.deque)) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


def reduce_dict(input_dict: Dict[str, float], average: bool = True
                ) -> Dict[str, float]:
    """Average (or sum) scalar metrics across processes
    (``misc.py:130-154``)."""
    if jax.process_count() == 1:
        return dict(input_dict)
    keys = sorted(input_dict.keys())
    values = np.asarray([input_dict[k] for k in keys], np.float64)
    gathered = _allgather_array(values).sum(axis=0)
    if average:
        gathered = gathered / jax.process_count()
    return dict(zip(keys, gathered.tolist()))


def all_gather_objects(obj) -> List:
    """Gather arbitrary picklable objects from all processes
    (``misc.py:85-127``).  Single-process: ``[obj]``."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = _allgather_array(np.asarray([payload.size], np.int64))[:, 0]
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(np.asarray(row[: int(sz)]).tobytes())
            for row, sz in zip(gathered, sizes)]


def device_memory_stats() -> str:
    """Peak device memory, the ``torch.cuda.max_memory_allocated()``
    analogue in the logger line (``misc.py:240-241``)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))
        return f"{peak / (1024 ** 2):.0f}MB"
    except Exception:
        return "n/a"


class MetricLogger:
    """``misc.py:157-262``: named SmoothedValues + ``log_every``.

    Parity surface: provided because the reference exposes it (where it
    is equally unused by the main training path — ``train_epoch`` uses
    AverageMeter/ProgressMeter instead, as does our ``Trainer``)."""

    def __init__(self, delimiter: str = "\t"):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def synchronize_between_processes(self):
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = ""):
        i = 0
        start_time = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        try:
            total = len(iterable)
        except TypeError:
            total = None
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or (total and i == total - 1):
                eta = (iter_time.global_avg * (total - i) if total else 0)
                eta_str = str(datetime.timedelta(seconds=int(eta)))
                print(self.delimiter.join([
                    header, f"[{i}{'/' + str(total) if total else ''}]",
                    f"eta: {eta_str}", str(self),
                    f"time: {iter_time}", f"data: {data_time}",
                    f"mem: {device_memory_stats()}",
                ]), flush=True)
            i += 1
            end = time.time()
        total_time = time.time() - start_time
        print(f"{header} Total time: "
              f"{datetime.timedelta(seconds=int(total_time))}", flush=True)
