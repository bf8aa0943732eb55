"""External run control: POSIX write-now signals, runTimeModifiable
controlDict re-reads, and the switch registry (VERDICT r1 item 9)."""

import os
import signal
import time as _time

from rapidcfd_tpu.utils.casegen import cavity_case
from rapidcfd_tpu.utils.timecontrol import Time


def _mk_time(tmp_path, extra=""):
    d = str(tmp_path)
    cavity_case(d, n=3)
    if extra:
        with open(os.path.join(d, "system", "controlDict"), "a") as f:
            f.write(extra)
    return d, Time(d)


def test_sigusr1_forces_checkpoint(tmp_path):
    d, t = _mk_time(tmp_path)
    assert not t.write_time() or int(t.write_interval) <= 0
    os.kill(os.getpid(), signal.SIGUSR1)
    _time.sleep(0.01)        # let the main-thread handler run
    assert t.write_time()    # checkpoint forced...
    assert t.run()           # ...but the run continues
    t.mark_written()
    assert not t.write_time()


def test_sigusr2_checkpoints_and_stops(tmp_path):
    d, t = _mk_time(tmp_path)
    os.kill(os.getpid(), signal.SIGUSR2)
    _time.sleep(0.01)
    assert t.write_time()
    assert not t.run()


def test_runtime_modifiable_rereads_controldict(tmp_path):
    d, t = _mk_time(tmp_path)
    assert t.run_time_modifiable
    cd = os.path.join(d, "system", "controlDict")
    text = open(cd).read().replace("endTime         0.5;",
                                   "endTime         0.015;")
    with open(cd, "w") as f:
        f.write(text)
    os.utime(cd, (os.path.getmtime(cd) + 2, os.path.getmtime(cd) + 2))
    n = 0
    while t.loop():
        n += 1
        assert n < 1000
    assert n == 3            # 0.015 / deltaT 0.005
    assert abs(t.end_time - 0.015) < 1e-12


def test_runtime_modifiable_stop_at_write_now(tmp_path):
    d, t = _mk_time(tmp_path)
    cd = os.path.join(d, "system", "controlDict")
    text = open(cd).read().replace("stopAt          endTime;",
                                   "stopAt          writeNow;")
    with open(cd, "w") as f:
        f.write(text)
    os.utime(cd, (os.path.getmtime(cd) + 2, os.path.getmtime(cd) + 2))
    assert not t.loop()      # stop requested...
    assert t.write_time()    # ...with a final checkpoint


def test_switch_registry_env_and_dump(tmp_path, monkeypatch):
    from rapidcfd_tpu.utils import switches
    assert switches.enabled("STRUCTURED_MG")     # default on
    monkeypatch.setenv("RCFD_STRUCTURED_MG", "0")
    switches._CACHE.pop("STRUCTURED_MG", None)
    assert not switches.enabled("STRUCTURED_MG")
    switches._CACHE.pop("STRUCTURED_MG", None)
    monkeypatch.delenv("RCFD_STRUCTURED_MG")
    assert "STRUCTURED_MG" in switches.dump()


def test_switch_from_case_controldict(tmp_path):
    from rapidcfd_tpu.utils import switches
    d, t = _mk_time(
        tmp_path,
        "\nOptimisationSwitches { FORCE_RCM 1; }\n")
    try:
        assert switches.enabled("FORCE_RCM")
    finally:
        switches._CASE.pop("FORCE_RCM", None)
        switches._CACHE.pop("FORCE_RCM", None)
