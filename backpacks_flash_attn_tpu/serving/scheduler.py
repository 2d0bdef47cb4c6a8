"""Request scheduler bindings: the C++ control-plane (csrc/scheduler.cpp)
via ctypes, with a semantically identical pure-Python fallback.

The C++ library is compiled on first use with g++ (pybind11 is not in the
image; the C ABI + ctypes keeps the binding dependency-free) and cached next
to the source keyed by content hash.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from collections import deque
from typing import List, Optional, Tuple

_CSRC = os.path.join(os.path.dirname(__file__), "..", "csrc")
_SRC = os.path.abspath(os.path.join(_CSRC, "scheduler.cpp"))


def _build_lib() -> Optional[str]:
    try:
        with open(_SRC, "rb") as f:
            tag = hashlib.sha1(f.read()).hexdigest()[:12]
        out = os.path.join(tempfile.gettempdir(),
                           f"bpsched_{tag}_{os.getuid()}.so")
        if not os.path.exists(out):
            tmp = out + ".build"
            subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                            _SRC, "-o", tmp], check=True,
                           capture_output=True)
            os.replace(tmp, out)
        return out
    except Exception:
        return None


_LIB = None
_LIB_TRIED = False


def _lib():
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB_TRIED = True
        path = _build_lib()
        if path:
            lib = ctypes.CDLL(path)
            lib.bpsched_new.restype = ctypes.c_void_p
            lib.bpsched_new.argtypes = [ctypes.c_int32] * 3
            lib.bpsched_free.argtypes = [ctypes.c_void_p]
            lib.bpsched_submit.restype = ctypes.c_int32
            lib.bpsched_submit.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                           ctypes.c_int32, ctypes.c_int32]
            lib.bpsched_admit.restype = ctypes.c_int32
            lib.bpsched_admit.argtypes = [ctypes.c_void_p,
                                          ctypes.POINTER(ctypes.c_int64),
                                          ctypes.POINTER(ctypes.c_int32)]
            for name in ("bpsched_num_pending", "bpsched_num_active",
                         "bpsched_slot_num_tokens", "bpsched_slot_active"):
                getattr(lib, name).restype = ctypes.c_int32
            lib.bpsched_num_pending.argtypes = [ctypes.c_void_p]
            lib.bpsched_num_active.argtypes = [ctypes.c_void_p]
            lib.bpsched_completed.restype = ctypes.c_int64
            lib.bpsched_completed.argtypes = [ctypes.c_void_p]
            lib.bpsched_on_token.restype = ctypes.c_int32
            lib.bpsched_on_token.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                             ctypes.c_int32]
            lib.bpsched_slot_request.restype = ctypes.c_int64
            lib.bpsched_slot_request.argtypes = [ctypes.c_void_p,
                                                 ctypes.c_int32]
            lib.bpsched_slot_num_tokens.argtypes = [ctypes.c_void_p,
                                                    ctypes.c_int32]
            lib.bpsched_slot_tokens.restype = ctypes.c_int32
            lib.bpsched_slot_tokens.argtypes = [
                ctypes.c_void_p, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
            lib.bpsched_slot_active.argtypes = [ctypes.c_void_p,
                                                ctypes.c_int32]
            lib.bpsched_release.argtypes = [ctypes.c_void_p, ctypes.c_int32]
            _LIB = lib
    return _LIB


def native_available() -> bool:
    return _lib() is not None


class NativeScheduler:
    """ctypes facade over csrc/scheduler.cpp."""

    def __init__(self, max_slots: int, max_seqlen: int, eos_id: int):
        self._lib = _lib()
        if self._lib is None:
            raise RuntimeError("native scheduler unavailable (g++ failed)")
        self._h = self._lib.bpsched_new(max_slots, max_seqlen, eos_id)
        self.max_slots = max_slots

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.bpsched_free(self._h)
            self._h = None

    def submit(self, request_id: int, prompt_len: int,
               max_new_tokens: int) -> bool:
        return self._lib.bpsched_submit(self._h, request_id, prompt_len,
                                        max_new_tokens) == 0

    def admit(self) -> Optional[Tuple[int, int, int]]:
        rid = ctypes.c_int64()
        plen = ctypes.c_int32()
        slot = self._lib.bpsched_admit(self._h, ctypes.byref(rid),
                                       ctypes.byref(plen))
        if slot < 0:
            return None
        return slot, rid.value, plen.value

    def on_token(self, slot: int, token: int) -> bool:
        r = self._lib.bpsched_on_token(self._h, slot, token)
        if r < 0:
            raise ValueError(f"bad/inactive slot {slot}")
        return bool(r)

    def slot_request(self, slot: int) -> int:
        return self._lib.bpsched_slot_request(self._h, slot)

    def slot_tokens(self, slot: int) -> List[int]:
        n = self._lib.bpsched_slot_num_tokens(self._h, slot)
        buf = (ctypes.c_int32 * max(n, 1))()
        got = self._lib.bpsched_slot_tokens(self._h, slot, buf, n)
        return list(buf[:got])

    def slot_active(self, slot: int) -> bool:
        return self._lib.bpsched_slot_active(self._h, slot) == 1

    def release(self, slot: int) -> None:
        self._lib.bpsched_release(self._h, slot)

    @property
    def num_pending(self) -> int:
        return self._lib.bpsched_num_pending(self._h)

    @property
    def num_active(self) -> int:
        return self._lib.bpsched_num_active(self._h)

    @property
    def completed(self) -> int:
        return self._lib.bpsched_completed(self._h)


class PyScheduler:
    """Pure-Python reference implementation with identical semantics
    (the conformance oracle for the C++ scheduler, and the fallback when no
    toolchain is present)."""

    def __init__(self, max_slots: int, max_seqlen: int, eos_id: int):
        self.max_slots = max_slots
        self.max_seqlen = max_seqlen
        self.eos_id = eos_id
        self._pending = deque()
        self._slots = [{"request_id": -1, "prompt_len": 0,
                        "max_new_tokens": 0, "tokens": [], "active": False}
                       for _ in range(max_slots)]
        # LIFO, lowest slot first — matches the C++ free-list order exactly
        self._free = list(range(max_slots - 1, -1, -1))
        self.completed = 0

    def submit(self, request_id, prompt_len, max_new_tokens) -> bool:
        if prompt_len <= 0 or prompt_len + 1 > self.max_seqlen:
            return False
        self._pending.append((request_id, prompt_len, max_new_tokens))
        return True

    def admit(self):
        if not self._pending or not self._free:
            return None
        slot = self._free.pop()
        rid, plen, mnt = self._pending.popleft()
        self._slots[slot] = {"request_id": rid, "prompt_len": plen,
                             "max_new_tokens": mnt, "tokens": [],
                             "active": True}
        return slot, rid, plen

    def on_token(self, slot, token) -> bool:
        sl = self._slots[slot]
        if not sl["active"]:
            raise ValueError(f"bad/inactive slot {slot}")
        sl["tokens"].append(token)
        done = (token == self.eos_id
                or len(sl["tokens"]) >= sl["max_new_tokens"]
                or sl["prompt_len"] + len(sl["tokens"]) >= self.max_seqlen)
        if done:
            sl["active"] = False
            self.completed += 1
        return done

    def slot_request(self, slot):
        return self._slots[slot]["request_id"]

    def slot_tokens(self, slot):
        return list(self._slots[slot]["tokens"])

    def slot_active(self, slot):
        return self._slots[slot]["active"]

    def release(self, slot):
        sl = self._slots[slot]
        if sl["request_id"] == -1:
            return
        sl.update(request_id=-1, active=False, tokens=[])
        self._free.append(slot)

    @property
    def num_pending(self):
        return len(self._pending)

    @property
    def num_active(self):
        return sum(1 for s in self._slots if s["active"])


def make_scheduler(max_slots: int, max_seqlen: int, eos_id: int,
                   prefer_native: bool = True):
    if prefer_native and native_available():
        return NativeScheduler(max_slots, max_seqlen, eos_id)
    return PyScheduler(max_slots, max_seqlen, eos_id)
