"""Template/instance CRUD surface (plans/api.py) vs the reference semantics:
validate-before-publish, version history, instance start + state, and the
HTTP wire layer (stdlib server, ephemeral port).
"""

from __future__ import annotations

import json
import urllib.request

import pytest

from nyuki_spark.catalog import load_table
from nyuki_spark.plans.api import TemplateNotFound, TemplateStore, serve
from nyuki_spark.plans.spec import SpecError

SPEC_V1 = {
    "steps": [
        {"op": "filter", "condition": "event_type == 'purchase'"},
        {"op": "set", "field": "route", "value": "billing"},
        {"op": "select", "fields": ["event_id", "route"]},
    ]
}
SPEC_V2 = {
    "steps": [
        {"op": "filter", "condition": "event_type == 'click'"},
        {"op": "select", "fields": ["event_id"]},
    ]
}


def test_store_validates_before_publish(spark, tmp_path):
    # ``spark`` is required: compiling a spec builds Column trees, which
    # need an active SparkContext even before any data is touched.
    store = TemplateStore(persist_dir=str(tmp_path))
    with pytest.raises(SpecError):
        store.put("bad", {"steps": [{"op": "warp-drive"}]})
    assert store.list() == []  # nothing stored on failed validation


def test_store_versions_and_crud(spark, tmp_path):
    store = TemplateStore(persist_dir=str(tmp_path))
    assert store.put("route", SPEC_V1)["version"] == 1
    assert store.put("route", SPEC_V2)["version"] == 2
    assert store.get("route")["version"] == 2  # latest wins
    assert store.get("route", version=1)["steps"] == SPEC_V1["steps"]
    assert store.list() == [{"name": "route", "latest_version": 2, "n_steps": 2}]
    assert (tmp_path / "route.v1.json").exists()
    assert (tmp_path / "route.v2.json").exists()
    store.delete("route")
    with pytest.raises(TemplateNotFound):
        store.get("route")


def test_instance_start_runs_pipeline(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    store = TemplateStore()
    store.put("route", SPEC_V1)
    inst, out = store.start_instance("route", events)
    assert inst.state == "running"
    rows = out.collect()
    want = events.where("event_type = 'purchase'").count()
    assert len(rows) == want
    assert set(out.columns) == {"event_id", "route"}
    done = store.finish_instance(inst.id, len(rows))
    assert done.state == "done" and done.rows == want
    assert store.instances()[0]["state"] == "done"


def test_http_round_trip(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    store = TemplateStore()
    server = serve(store, tables={"events": events})
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"

    def call(method, path, body=None):
        req = urllib.request.Request(
            base + path,
            method=method,
            data=json.dumps(body).encode() if body is not None else None,
        )
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        code, out = call("PUT", "/templates/route", SPEC_V1)
        assert (code, out["version"]) == (200, 1)
        code, out = call("PUT", "/templates/route", SPEC_V2)
        assert out["version"] == 2
        code, bad = call("PUT", "/templates/bad", {"steps": [{"op": "nope"}]})
        assert code == 400 and "unknown" in bad["error"]

        code, lst = call("GET", "/templates")
        assert [t["name"] for t in lst] == ["route"]
        code, v1 = call("GET", "/templates/route?version=1")
        assert v1["version"] == 1

        code, run = call("POST", "/templates/route/instances", {"table": "events", "version": 1, "limit": 5})
        assert code == 200 and run["instance"]["state"] == "done"
        assert all(r["route"] == "billing" for r in run["rows"])
        code, insts = call("GET", "/instances")
        assert len(insts) == 1

        code, _ = call("DELETE", "/templates/route")
        assert code == 200
        code, _ = call("GET", "/templates/route")
        assert code == 404
    finally:
        server.shutdown()
