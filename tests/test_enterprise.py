"""Enterprise ops unit tests — pure logic, no model (strategy of the
reference's test-enterprise.cpp: 24 mock-based tests, README.md:1161-1185)."""

import threading
import time

import pytest

from superllama_tpu.server.enterprise import (
    ApiKeyManager,
    AuditLogger,
    ContentFilter,
    CostTracker,
    HealthMonitor,
    Permission,
    Priority,
    PriorityRequestQueue,
    RateLimiter,
    RBAC,
    Role,
    SLAMonitor,
)
from superllama_tpu.server.metrics import JsonlMetricsLogger, MetricsRegistry, Tracer


def test_queue_priority_order():
    q = PriorityRequestQueue()
    q.enqueue("low", Priority.LOW)
    q.enqueue("crit", Priority.CRITICAL)
    q.enqueue("norm", Priority.NORMAL)
    q.enqueue("high", Priority.HIGH)
    assert [q.dequeue(0) for _ in range(4)] == ["crit", "high", "norm", "low"]


def test_queue_client_fairness():
    q = PriorityRequestQueue()
    for i in range(3):
        q.enqueue(f"a{i}", client_id="alice")
    q.enqueue("b0", client_id="bob")
    got = [q.dequeue(0) for _ in range(4)]
    # bob's single request must not be starved behind all of alice's
    assert got.index("b0") <= 1


def test_queue_timeout_expiry():
    q = PriorityRequestQueue()
    q.enqueue("x", timeout_s=0.01)
    time.sleep(0.05)
    assert q.dequeue(0) is None
    assert q.stats["expired"] == 1


def test_queue_max_size():
    q = PriorityRequestQueue(max_size=2)
    assert q.enqueue(1) and q.enqueue(2)
    assert not q.enqueue(3)
    assert q.stats["rejected"] == 1


def test_rate_limiter_rpm_and_burst():
    rl = RateLimiter(requests_per_minute=2, burst=1)
    assert rl.allow_request("c") and rl.allow_request("c") and rl.allow_request("c")
    assert not rl.allow_request("c")          # 2 + 1 burst exhausted
    assert rl.allow_request("other")          # per-client isolation


def test_rate_limiter_tokens():
    rl = RateLimiter(tokens_per_minute=100)
    assert rl.allow_tokens("c", 60)
    assert not rl.allow_tokens("c", 50)
    assert rl.allow_tokens("c", 40)
    assert rl.usage("c")["tokens_last_min"] == 100


def test_rbac():
    r = RBAC()
    r.assign("alice", "admin")
    r.assign("bob", "user")
    assert r.check("alice", Permission.CONFIG_WRITE)
    assert r.check("bob", Permission.INFERENCE)
    assert not r.check("bob", Permission.CONFIG_WRITE)
    assert not r.check("carol", Permission.INFERENCE)
    r.add_role(Role("llama-only", {Permission.INFERENCE}, allowed_models={"llama"}))
    r.assign("dave", "llama-only")
    assert r.check("dave", Permission.INFERENCE, model="llama")
    assert not r.check("dave", Permission.INFERENCE, model="mixtral")


def test_api_keys():
    km = ApiKeyManager()
    km.create("sk-test-123", "alice", scopes={"inference"})
    assert km.validate("sk-test-123") == "alice"
    assert km.validate("sk-wrong") is None
    assert km.validate("sk-test-123", scope="admin") is None
    km.create("sk-exp", "bob", expires_at=time.time() - 1)
    assert km.validate("sk-exp") is None
    km.revoke("sk-test-123")
    assert km.validate("sk-test-123") is None


def test_content_filter():
    cf = ContentFilter()
    cf.add_word("forbidden")
    cf.add_pattern(r"\d{3}-\d{2}-\d{4}")  # SSN-ish
    assert cf.check("hello world") == (True, None)
    ok, why = cf.check("this is FORBIDDEN text")
    assert not ok and "forbidden" in why
    ok, why = cf.check("ssn 123-45-6789")
    assert not ok


def test_audit_logger(tmp_path):
    path = tmp_path / "audit.jsonl"
    al = AuditLogger(str(path))
    al.log("request", "alice", {"path": "/v1/completions"})
    al.log("auth_failure", "bob")
    al.log("request", "alice")
    assert len(al.query("request")) == 2
    assert len(al.query(client_id="bob")) == 1
    assert path.read_text().count("\n") == 3
    with pytest.raises(AssertionError):
        al.log("nonsense-event")


def test_cost_tracker():
    ct = CostTracker()
    ct.set_pricing("m", 1.0, 3.0)  # $/1M tokens
    ct.record("alice", "m", 1_000_000, 1_000_000)
    ct.record("alice", "m", 500_000, 0)
    bill = ct.bill("alice")
    assert bill["requests"] == 2
    assert bill["cost_usd"] == pytest.approx(1.0 + 3.0 + 0.5)


def test_sla_monitor_alerts():
    alerts = []
    sla = SLAMonitor(latency_p95_target_s=0.1, error_rate_target=0.5,
                     alert=lambda k, s: alerts.append(k))
    for _ in range(20):
        sla.record(0.01, ok=True)
    assert not alerts
    for _ in range(20):
        sla.record(1.0, ok=True)
    assert "latency_sla_violation" in alerts
    snap = sla.snapshot()
    assert snap["p95_s"] >= 0.9 and snap["availability"] == 1.0


def test_health_monitor():
    hm = HealthMonitor()
    assert hm.run_checks() == "healthy"
    hm.register("good", lambda: True)
    hm.register("bad", lambda: False)
    assert hm.run_checks() == "degraded"
    hm.register("good", lambda: False)
    assert hm.run_checks() == "unhealthy"
    hm.register("throws", lambda: 1 / 0)
    assert hm.run_checks() == "unhealthy"


def test_metrics_registry_prometheus_text():
    m = MetricsRegistry(namespace="t")
    m.counter_inc("reqs", labels={"path": "/x"})
    m.counter_inc("reqs", labels={"path": "/x"})
    m.gauge_set("depth", 3)
    m.histogram_declare("lat", [0.1, 1.0])
    m.histogram_observe("lat", 0.05)
    m.histogram_observe("lat", 5.0)
    text = m.expose()
    assert 't_reqs{path="/x"} 2.0' in text
    assert "t_depth 3" in text
    assert 't_lat_bucket{le="0.1"} 1' in text
    assert 't_lat_bucket{le="+Inf"} 2' in text
    assert "t_lat_count 2" in text


def test_tracer_spans():
    tr = Tracer()
    with tr.span("decode", layer=3) as s:
        s.add_event("kv_write")
        time.sleep(0.001)
    assert tr.spans[0].duration_s > 0
    assert tr.spans[0].status == "ok"
    with pytest.raises(ValueError):
        with tr.span("fail"):
            raise ValueError("x")
    assert tr.spans[1].status == "error"


def test_queue_thread_safety():
    q = PriorityRequestQueue()
    out = []

    def producer(n):
        for i in range(50):
            q.enqueue((n, i))

    def consumer():
        while True:
            item = q.dequeue(timeout=0.2)
            if item is None:
                return
            out.append(item)

    threads = [threading.Thread(target=producer, args=(i,)) for i in range(4)]
    cons = [threading.Thread(target=consumer) for _ in range(2)]
    for t in threads + cons:
        t.start()
    for t in threads + cons:
        t.join()
    assert len(out) == 200
    assert len(set(out)) == 200


def test_checkpoint_manager(tmp_path):
    from superllama_tpu.server.enterprise import CheckpointManager

    cm = CheckpointManager(str(tmp_path / "ck"), every_n_tokens=10,
                           max_per_request=2)
    import numpy as np
    snaps = []
    for n in (5, 10, 25, 40, 55):
        p = cm.maybe_checkpoint("req1", n, lambda: {"x": np.arange(3)})
        snaps.append(p)
    assert snaps[0] is None            # below interval
    assert snaps[1] and snaps[2] and snaps[3]
    assert cm.latest("req1") == snaps[-1]
    import os
    live = [p for p in snaps if p and os.path.exists(p)]
    assert len(live) == 2              # retention enforced
    cm.cleanup("req1")
    assert cm.latest("req1") is None
    assert not any(os.path.exists(p) for p in snaps if p)


def test_recovery_manager_retries_and_oom_hook():
    from superllama_tpu.server.enterprise import FailureType, RecoveryManager

    rm = RecoveryManager(max_retries=3, backoff_s=0.001)
    calls = {"n": 0, "oom": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return "ok"

    out = rm.run(flaky, on_oom=lambda: calls.__setitem__("oom", calls["oom"] + 1))
    assert out == "ok" and calls["oom"] == 2
    assert rm.stats["recoveries"] == 1

    def always_bad():
        raise ValueError("invalid shape")

    with pytest.raises(ValueError):
        rm.run(always_bad)
    assert rm.stats["failures"] == 1
    assert RecoveryManager.classify(ValueError("x")) == FailureType.INVALID_STATE
    assert RecoveryManager.classify(RuntimeError("deadline exceeded")) == FailureType.TIMEOUT
