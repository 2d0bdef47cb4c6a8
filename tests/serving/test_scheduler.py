"""Scheduler tests: semantics + step-for-step conformance between the C++
(csrc/scheduler.cpp, via ctypes) and Python implementations."""

import numpy as np
import pytest

from backpacks_flash_attn_tpu.serving import scheduler as sched_lib


def test_native_builds():
    assert sched_lib.native_available(), "g++ build of scheduler.cpp failed"


def _impls():
    out = [sched_lib.PyScheduler]
    if sched_lib.native_available():
        out.append(sched_lib.NativeScheduler)
    return out


@pytest.mark.parametrize("impl", _impls())
def test_lifecycle(impl):
    s = impl(2, 16, eos_id=99)
    assert s.submit(10, 4, 8)
    assert s.submit(11, 3, 2)
    assert s.submit(12, 5, 20)   # budget > capacity: finishes on capacity
    assert not s.submit(13, 20, 8)       # can never fit
    assert s.num_pending == 3

    a0 = s.admit(); a1 = s.admit()
    assert a0 == (0, 10, 4) and a1 == (1, 11, 3)
    assert s.admit() is None             # no free slot
    assert s.num_active == 2

    assert not s.on_token(0, 5)
    assert not s.on_token(1, 5)
    assert s.on_token(1, 7)              # hits max_new_tokens=2
    assert not s.slot_active(1)
    assert s.slot_tokens(1) == [5, 7]
    s.release(1)
    assert s.admit() == (1, 12, 5)       # freed slot reused

    assert s.on_token(0, 99)             # EOS
    assert s.slot_tokens(0) == [5, 99]
    # capacity: prompt 5 + 11 tokens == max_seqlen 16
    done = False
    for i in range(11):
        done = s.on_token(1, i)
    assert done
    assert s.completed == 3


@pytest.mark.parametrize("impl", _impls())
def test_on_token_inactive_slot_raises(impl):
    s = impl(1, 8, eos_id=0)
    with pytest.raises(ValueError):
        s.on_token(0, 1)


@pytest.mark.skipif(not sched_lib.native_available(), reason="no g++")
def test_cpp_python_conformance_fuzz():
    """Random op streams must produce identical observable behavior."""
    rng = np.random.default_rng(0)
    cpp = sched_lib.NativeScheduler(4, 32, eos_id=7)
    py = sched_lib.PyScheduler(4, 32, eos_id=7)
    rid = 0
    for _ in range(2000):
        op = rng.integers(0, 4)
        if op == 0:
            plen = int(rng.integers(0, 40))
            mnt = int(rng.integers(1, 10))
            assert cpp.submit(rid, plen, mnt) == py.submit(rid, plen, mnt)
            rid += 1
        elif op == 1:
            assert cpp.admit() == py.admit()
        elif op == 2:
            slot = int(rng.integers(0, 4))
            tok = int(rng.integers(0, 12))
            if py.slot_active(slot):
                assert cpp.on_token(slot, tok) == py.on_token(slot, tok)
                assert cpp.slot_tokens(slot) == py.slot_tokens(slot)
        else:
            slot = int(rng.integers(0, 4))
            if not py.slot_active(slot):
                cpp.release(slot)
                py.release(slot)
        assert cpp.num_pending == py.num_pending
        assert cpp.num_active == py.num_active
    assert cpp.completed == py.completed
