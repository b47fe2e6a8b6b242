"""FLOPs accounting, remote shard cache, metrics logger."""

import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esvit_tpu import config
from esvit_tpu.data.remote import RemoteShardCache
from esvit_tpu.models.registry import build_backbone
from esvit_tpu.utils import flops
from esvit_tpu.utils.metrics import MetricLogger, SmoothedValue


def test_flops_accounting(rng):
    bb = build_backbone(config.swin_femto())
    x = jnp.zeros((1, 32, 32, 3))
    v = bb.init({"params": rng}, x, deterministic=True)
    cost = flops.forward_cost(bb, v, (1, 32, 32, 3))
    assert cost["params"] > 0
    # femto swin fwd is a few MFLOPs at 32px — sanity bounds only
    assert cost["flops"] > 1e5 or cost["flops"] == -1.0
    s = flops.summarize(bb, v, image_size=32)
    assert "params" in s


def test_remote_cache_fetch_and_evict(tmp_path):
    # file:// like local fetch via curl is overkill; use a fake copier by
    # monkeypatching the command to 'cp'
    import esvit_tpu.data.remote as remote

    src_dir = tmp_path / "remote"
    src_dir.mkdir()
    for i in range(3):
        (src_dir / f"shard{i}.tsv").write_text(f"data{i}")

    orig = remote._copier_cmd
    remote._copier_cmd = lambda url, dst: ["cp", url.replace("fake://", ""), dst]
    try:
        cache = RemoteShardCache(str(tmp_path / "cache"), max_files=2)
        p0 = cache.fetch(f"fake://{src_dir}/shard0.tsv")
        assert open(p0).read() == "data0"
        p1 = cache.fetch(f"fake://{src_dir}/shard1.tsv")
        p2 = cache.fetch(f"fake://{src_dir}/shard2.tsv")   # evicts shard0
        assert not os.path.isfile(p0)
        assert os.path.isfile(p1) and os.path.isfile(p2)
        # re-fetch works after eviction
        p0b = cache.fetch(f"fake://{src_dir}/shard0.tsv")
        assert open(p0b).read() == "data0"
    finally:
        remote._copier_cmd = orig


def test_remote_cache_retry_exhaustion(tmp_path):
    import esvit_tpu.data.remote as remote

    orig = remote._copier_cmd
    remote._copier_cmd = lambda url, dst: ["false"]
    try:
        cache = RemoteShardCache(str(tmp_path / "c"), retries=2)
        with pytest.raises(RuntimeError, match="failed to fetch"):
            cache.fetch("fake://nowhere/x.tsv")
    finally:
        remote._copier_cmd = orig


def test_metric_logger_meters():
    m = MetricLogger()
    for i in range(5):
        m.update(loss=float(i))
    assert m.meters["loss"].count == 5
    assert m.meters["loss"].global_avg == 2.0
    sv = SmoothedValue(window=2)
    sv.update(1.0)
    sv.update(3.0)
    sv.update(5.0)
    assert sv.avg == 4.0          # window keeps last 2
    assert sv.global_avg == 3.0
