"""Grouper: static group tables for bias adjustment
(reference: the xsdba package's Grouper — xclim.sdba re-exports it;
xclim:src/xclim/sdba.py:1-28, docs/sdba.rst).

A Grouper turns ``group='time.dayofyear', window=31`` into two static integer
tables computed host-side:

* a *training* gather table (n_groups, max_samples) collecting every time step
  whose (windowed) day-of-year / month / season matches the group;
* an *adjust* mapping: for each time step, its group id and the step's slot in
  the group (to scatter per-group results back onto the time axis with one
  gather).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from xclim_tpu.core.calendar import TimeIndex, max_doy

__all__ = ["Grouper"]

_SEASON_OF_MONTH = np.array([0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 0])  # DJF=0...


@dataclass
class Grouper:
    """Grouping of time steps for adjustment training (xsdba Grouper).

    Parameters
    ----------
    group : {"time", "time.month", "time.season", "time.dayofyear"}
        Grouping dimension.
    window : int
        Odd number of days around each day-of-year to include in training
        (only for time.dayofyear; reference default 1, north-star config 31).
    """

    group: str = "time"
    window: int = 1

    def __post_init__(self):
        if isinstance(self.group, Grouper):
            other = self.group
            self.group = other.group
            self.window = other.window
        if self.group not in ("time", "time.month", "time.season", "time.dayofyear"):
            raise ValueError(f"Unsupported group {self.group!r}")
        if self.window % 2 != 1:
            raise ValueError("window must be odd")

    @property
    def prop(self) -> str:
        return self.group.split(".")[-1] if "." in self.group else "group"

    def n_groups(self, time: TimeIndex) -> int:
        if self.group == "time":
            return 1
        if self.group == "time.month":
            return 12
        if self.group == "time.season":
            return 4
        return max_doy(time.calendar)

    def group_of_step(self, time: TimeIndex) -> np.ndarray:
        """(T,) int32 group id per time step."""
        if self.group == "time":
            return np.zeros(len(time), dtype=np.int32)
        if self.group == "time.month":
            return (time.month - 1).astype(np.int32)
        if self.group == "time.season":
            return _SEASON_OF_MONTH[time.month - 1].astype(np.int32)
        return (time.doy - 1).astype(np.int32)

    def train_table(self, time: TimeIndex) -> np.ndarray:
        """(n_groups, max_samples) int32 gather table, -1 padded.

        For ``time.dayofyear`` the window widens each group with the
        neighbouring doys (wrapping around the year)."""
        G = self.n_groups(time)
        T = len(time)
        gid = self.group_of_step(time)
        if self.group == "time.dayofyear" and self.window > 1:
            half = self.window // 2
            mx = max_doy(time.calendar)
            # member[g] = steps with doy in [g+1-half, g+1+half] (wrapped)
            doy0 = gid  # 0-based doy
            rows = []
            counts = np.zeros(G, dtype=np.int64)
            # offsets trick: step with doy d belongs to groups d-half..d+half
            offs = np.arange(-half, half + 1)
            gg = (doy0[None, :] + offs[:, None]) % mx  # (window, T)
            flat_g = gg.reshape(-1)
            flat_t = np.tile(np.arange(T, dtype=np.int32), self.window)
            order = np.argsort(flat_g, kind="stable")
            flat_g = flat_g[order]
            flat_t = flat_t[order]
            counts = np.bincount(flat_g, minlength=G)
            maxs = int(counts.max()) if len(counts) else 0
            table = np.full((G, maxs), -1, dtype=np.int32)
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            within = np.arange(len(flat_g)) - starts[flat_g]
            table[flat_g, within] = flat_t
            return table
        counts = np.bincount(gid, minlength=G)
        maxs = int(counts.max()) if len(counts) else 0
        table = np.full((G, maxs), -1, dtype=np.int32)
        order = np.argsort(gid, kind="stable")
        sg = gid[order]
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(T) - starts[sg]
        table[sg, within] = order.astype(np.int32)
        return table

    def doy_table(self, time: TimeIndex) -> np.ndarray:
        """(n_doy, max_occurrences) int32 time-index per (doy, occurrence),
        -1 padded; occurrences in chronological order.

        The doy-slice layout feeds the windowed-quantile training kernel
        (ops/pallas/winquantile.py): slices are sorted once and windows are
        merged from sorted runs, instead of gathering every step ``window``
        times (the reference materializes the windowed construct —
        xclim:src/xclim/core/calendar.py:428-447 rolling construct)."""
        doy0 = (time.doy - 1).astype(np.int64)
        G = max_doy(time.calendar)
        counts = np.bincount(doy0, minlength=G)
        ms = int(counts.max()) if len(counts) else 0
        table = np.full((G, ms), -1, dtype=np.int32)
        order = np.argsort(doy0, kind="stable")
        sg = doy0[order]
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(len(time)) - starts[sg]
        table[sg, within] = order.astype(np.int32)
        return table

    def device_doy_table(self, time: TimeIndex):
        """Device-resident doy_table, memoized per (grouper, time)."""
        import jax.numpy as jnp

        if not self._cacheable():
            return jnp.asarray(self.doy_table(time))
        key = (b"doy", self._time_key(time))
        cache = self._dev_cache()
        if key not in cache:
            cache[key] = jnp.asarray(self.doy_table(time))
        return cache[key]

    # -- device-resident table cache ----------------------------------------
    # Tables cross the host->device tunnel (~15 MB/s) once per distinct time
    # index instead of once per train/adjust call; the same cache key also
    # keeps jax.jit retracing keyed to genuinely new time axes.

    def _time_key(self, time: TimeIndex) -> bytes:
        import hashlib

        h = hashlib.sha1()
        h.update(f"{self.group}|{self.window}|{time.calendar}".encode())
        h.update(time.year.tobytes())
        h.update(time.month.tobytes())
        h.update(time.day.tobytes())
        return h.digest()

    def _dev_cache(self) -> dict:
        c = getattr(self, "_device_tables", None)
        if c is None:
            c = {}
            object.__setattr__(self, "_device_tables", c)
        return c

    @staticmethod
    def _cacheable() -> bool:
        # never cache device arrays created under an active trace — the
        # cached tracer would leak out of the enclosing jit/shard_map
        from jax._src import core as _core

        return _core.trace_state_clean()

    def device_train_table(self, time: TimeIndex):
        """Device-resident train_table, memoized per (grouper, time)."""
        import jax.numpy as jnp

        if not self._cacheable():
            return jnp.asarray(self.train_table(time))
        key = (b"train", self._time_key(time))
        cache = self._dev_cache()
        if key not in cache:
            cache[key] = jnp.asarray(self.train_table(time))
        return cache[key]

    def device_adjust_table(self, time: TimeIndex):
        """Device-resident (table, gid, flat_pos), memoized per time index."""
        import jax.numpy as jnp

        if not self._cacheable():
            table, gid, flat_pos = self.adjust_table(time)
            return (jnp.asarray(table), jnp.asarray(gid),
                    jnp.asarray(flat_pos))
        key = (b"adjust", self._time_key(time))
        cache = self._dev_cache()
        if key not in cache:
            table, gid, flat_pos = self.adjust_table(time)
            cache[key] = (jnp.asarray(table), jnp.asarray(gid),
                          jnp.asarray(flat_pos))
        return cache[key]

    def adjust_table(self, time: TimeIndex) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Tables to process per-group then scatter back to the time axis.

        Returns (table, gid, flat_pos): table (n_groups, max_steps) gathers sim
        steps per group (no window); gid (T,); flat_pos (T,) such that
        ``out_time = res_flat[flat_pos]`` where res_flat = res.reshape(G*ms, ...).
        """
        G = self.n_groups(time)
        T = len(time)
        gid = self.group_of_step(time)
        counts = np.bincount(gid, minlength=G)
        ms = int(counts.max()) if len(counts) else 0
        table = np.full((G, ms), -1, dtype=np.int32)
        order = np.argsort(gid, kind="stable")
        sg = gid[order]
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(T) - starts[sg]
        table[sg, within] = order.astype(np.int32)
        flat_pos = np.empty(T, dtype=np.int32)
        flat_pos[order] = sg * ms + within
        return table, gid.astype(np.int32), flat_pos
