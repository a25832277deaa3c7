"""Profiling and checkpoint/resume tests."""

import numpy as np


def test_phase_timers_and_ledger():
    import time

    from lilac_tpu.utils.profiling import FlopLedger, PhaseTimers, roofline

    t = PhaseTimers()
    t.start("init")
    time.sleep(0.01)
    t.stop("init")
    assert t.total["init"] >= 0.01
    rep = t.report()
    assert "init" in rep

    led = FlopLedger()
    led.add_spmv(1_000_000, time_s=0.001)
    assert "spmv" in led.report()

    r = roofline(bytes_moved=1e9, flops=2e9, time_s=0.01)
    assert r["gbps"] > 0 and r["bound"] in ("memory", "compute")


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from lilac_tpu.ops import dfloat as df
    from lilac_tpu.utils import checkpoint as ck

    state = (jnp.arange(5.0), df.from_f64(np.asarray([1.0, 2.0])))
    p = str(tmp_path / "s.npz")
    ck.save_state(p, state, dict(iter=3, zetas=[1.0, 2.0]))
    back, meta = ck.load_state(p, state)
    assert meta["iter"] == 3
    np.testing.assert_array_equal(np.asarray(back[0]), np.arange(5.0))
    np.testing.assert_array_equal(df.to_f64(back[1]), [1.0, 2.0])


def test_checkpointed_power_method_resumes(tmp_path):
    """Interrupt after 5 outer iterations; resumed run continues from the
    checkpoint and matches an uninterrupted run."""
    from lilac_tpu.generate.npb import CLASSES, make_cg_matrix
    from lilac_tpu.plan import SpmvPlan
    from lilac_tpu.utils import checkpoint as ck

    cls = CLASSES["S"]
    indptr, indices, data, _ = make_cg_matrix("S")
    plan = SpmvPlan(indptr, indices, data, (cls.na, cls.na), dtype="f64")
    x0 = plan.vec_in(np.ones(cls.na))

    p = str(tmp_path / "cg.npz")
    z1, xf, start = ck.checkpointed_power_method(
        plan, x0, cls.shift, 5, path=p, every=5
    )
    assert start == 0 and len(z1) == 5
    # resume to 15
    z2, xf, start = ck.checkpointed_power_method(
        plan, x0, cls.shift, 15, path=p, every=5
    )
    assert start == 5 and len(z2) == 15
    # uninterrupted reference
    p2 = str(tmp_path / "cg2.npz")
    z3, _, _ = ck.checkpointed_power_method(plan, x0, cls.shift, 15, path=p2, every=15)
    np.testing.assert_allclose(z2, z3, rtol=1e-12)
    assert abs(z2[-1] - cls.zeta_verify) / cls.zeta_verify < 1e-10
