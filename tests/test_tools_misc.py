"""Profiling / sysstats / warmup utilities: smoke coverage on CPU."""
import numpy as np


def test_timed_and_device_memory(tmp_path, capsys):
    from mdir_tpu.tools.profiling import device_memory_profile, timed

    with timed("block"):
        np.ones((4,)).sum()
    out = capsys.readouterr().out
    assert "[block]" in out and "s" in out

    data = device_memory_profile()
    assert isinstance(data, bytes) and len(data) > 0
    path = device_memory_profile(str(tmp_path / "mem.pprof"))
    assert (tmp_path / "mem.pprof").stat().st_size > 0


def test_sysstats():
    from mdir_tpu.tools.sysstats import DeviceStats, HostStats

    usage = DeviceStats.memory_usage()
    assert usage and all("bytes_in_use" in v for v in usage.values())
    by_pid = DeviceStats.memory_usage_by_pid()
    assert len(by_pid) == 1

    used, total = HostStats.memory_gb()
    assert 0 < used <= total
    assert len(HostStats.loadavg()) == 3


def test_warmup_extraction_compiles_buckets(rng):
    """warmup_extraction pre-compiles one fused program per shape bucket."""
    from mdir_tpu.models import initialize_model
    from mdir_tpu.tools.warmup import bucket_shapes, warmup_extraction

    assert bucket_shapes([(65, 70), (60, 66)], 64) == [(64, 128), (128, 128)]

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "alexnet",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    compiled = warmup_extraction(
        model, shapes=[(64, 80)], scales=(1,), max_batch=2,
        mean_std=([0.5] * 3, [0.5] * 3))
    assert compiled == [(64, 80)]
