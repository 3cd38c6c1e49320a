"""Ops HTTP endpoint (S11 parity): built-in + user routes."""

from __future__ import annotations

import json
import urllib.request

from callysto_spark.app import App


def test_ops_server_routes(spark):
    app = App("web_app", spark=spark, checkpoint_root="/tmp/callysto_spark/web_app/ckpt")
    app.state["greeting"] = "hi"

    @app.page("custom")
    def custom():
        return {"answer": 42}

    @app.page("echo")
    def echo(req):
        # request-object parity (reference routes get (Request, Context),
        # types/route.rs:6-67)
        return {"method": req.method, "path": req.path, "who": req.param("who", "nobody")}

    app.run(await_termination=False)
    try:
        base = f"http://127.0.0.1:{app.web_port}"
        root = json.loads(urllib.request.urlopen(f"{base}/").read())
        assert root["app"] == "web_app"
        state = json.loads(urllib.request.urlopen(f"{base}/state").read())
        assert state["greeting"] == "'hi'"
        custom_resp = json.loads(urllib.request.urlopen(f"{base}/custom").read())
        assert custom_resp == {"answer": 42}
        echo = json.loads(urllib.request.urlopen(f"{base}/echo?who=callysto").read())
        assert echo == {"method": "GET", "path": "/echo", "who": "callysto"}
        post = json.loads(
            urllib.request.urlopen(
                urllib.request.Request(f"{base}/echo", data=b"x", method="POST")
            ).read()
        )
        assert post["method"] == "POST"
        progress = json.loads(urllib.request.urlopen(f"{base}/progress").read())
        assert progress == []
        try:
            urllib.request.urlopen(f"{base}/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        app.stop()
