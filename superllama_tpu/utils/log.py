"""Leveled logger with an in-memory ring buffer (common/log.{h,cpp}
counterpart): timestamps, level filtering, optional color + file sink, and
the last-N-lines query the reference's ring buffer serves."""

from __future__ import annotations

import collections
import os
import sys
import threading
import time

LEVELS = {"debug": 10, "info": 20, "warn": 30, "error": 40, "none": 99}
_COLORS = {"debug": "\x1b[90m", "info": "", "warn": "\x1b[33m",
           "error": "\x1b[31m"}


class Logger:
    def __init__(self, level: str | None = None, ring_size: int = 1024,
                 stream=None, color: bool | None = None,
                 file_path: str | None = None):
        self.level = LEVELS[level or os.environ.get("SLT_LOG_LEVEL", "info")]
        self.stream = stream or sys.stderr
        self.color = (self.stream.isatty() if color is None else color)
        self.ring: collections.deque[str] = collections.deque(maxlen=ring_size)
        self._file = open(file_path, "a") if file_path else None
        self._lock = threading.Lock()

    def _emit(self, lvl: str, msg: str, *args):
        if LEVELS[lvl] < self.level:
            return
        if args:
            msg = msg % args
        line = f"{time.strftime('%H:%M:%S')} {lvl[0].upper()} {msg}"
        with self._lock:
            self.ring.append(line)
            if self.color and _COLORS[lvl]:
                print(f"{_COLORS[lvl]}{line}\x1b[0m", file=self.stream)
            else:
                print(line, file=self.stream)
            if self._file:
                self._file.write(line + "\n")
                self._file.flush()

    def debug(self, msg, *a):
        self._emit("debug", msg, *a)

    def info(self, msg, *a):
        self._emit("info", msg, *a)

    def warn(self, msg, *a):
        self._emit("warn", msg, *a)

    def error(self, msg, *a):
        self._emit("error", msg, *a)

    def tail(self, n: int = 100) -> list[str]:
        with self._lock:
            return list(self.ring)[-n:]

    def set_level(self, level: str):
        self.level = LEVELS[level]


_main: Logger | None = None


def log() -> Logger:
    global _main
    if _main is None:
        _main = Logger()
    return _main
