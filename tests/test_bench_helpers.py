"""Guards for the driver-facing bench surface (bench.py): the roofline
arithmetic behind the official JSON's ``roofline_frac`` and the per-dataset
batch-size table the flagship measurement keys on."""

import bench


def test_roofline_math(monkeypatch):
    """hbm/mxu fractions = achieved logical GB/s (resp. TFLOP/s) over the
    device-kind peaks; omitted for unknown kinds; empty without cost data."""

    class FakeDev:
        device_kind = "TPU v5 lite"

    monkeypatch.setattr(bench.jax, "devices", lambda: [FakeDev()])
    res = {
        "step_ms": 100.0,  # 0.1 s
        "gflop_per_step": 1970.0,  # -> 19.7 TFLOP/s = 0.1 of 197e12
        "logical_gb_per_step": 40.95,  # -> 409.5 GB/s = 0.5 of 819e9
    }
    out = bench._roofline(res)
    assert out["hbm_frac"] == 0.5
    assert out["mxu_frac"] == 0.1
    assert out["achieved_tflops"] == 19.7
    assert out["achieved_logical_gbps"] == 409.5

    class Unknown:
        device_kind = "cpu"

    monkeypatch.setattr(bench.jax, "devices", lambda: [Unknown()])
    out = bench._roofline(res)
    assert "hbm_frac" not in out and "mxu_frac" not in out
    assert out["gflop_per_step"] == 1970.0  # achieved numbers still emitted

    assert bench._roofline({"step_ms": 1.0}) == {}


def test_cost_analysis_shapes(monkeypatch):
    """_cost_analysis handles both dict and list-of-dict cost_analysis()
    returns, and degrades to {} when the backend lacks support."""

    class FakeCompiled:
        def __init__(self, ca):
            self._ca = ca

        def cost_analysis(self):
            return self._ca

    class FakeLowered:
        def __init__(self, ca):
            self._ca = ca

        def compile(self):
            return FakeCompiled(self._ca)

    class FakeJitted:
        def __init__(self, ca):
            self._ca = ca

        def lower(self, *a):
            if isinstance(self._ca, Exception):
                raise self._ca
            return FakeLowered(self._ca)

    ca = {"flops": 2e9, "bytes accessed": 3e9}
    out = bench._cost_analysis(FakeJitted(ca))
    assert out == {"gflop_per_step": 2.0, "logical_gb_per_step": 3.0}
    assert bench._cost_analysis(FakeJitted([ca])) == out
    assert bench._cost_analysis(FakeJitted(RuntimeError("nope"))) == {}


def test_default_bs_table_covers_both_datasets():
    for ds in ("cityscapes", "nyuv2"):
        assert set(bench.DEFAULT_TPU_BS[ds]) == {"basic", "mtan", "csnet"}
    # measured sweet spots (BENCH_NOTES): mtan's nyuv2 bs law is inverted
    assert bench.DEFAULT_TPU_BS["nyuv2"]["mtan"] == 16
