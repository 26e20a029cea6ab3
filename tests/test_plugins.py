"""Reader/Writer plugin SPI + job pre/post handlers
(dataxPluginDev.md:55-140; JobContainer.java:312-378)."""

import pyarrow as pa
import pytest

from datax_ray.cli import JobError, run_job
from datax_ray.plugins import register_source, register_sink

COLLECTED: list = []
HANDLER_TRACE: list = []


@register_source("range_source")
def range_source(parameter):
    import ray.data as rd

    n = int(parameter.get("n", 10))
    return rd.from_arrow(pa.table({"x": pa.array(range(n), pa.int64())}))


@register_sink("collect_sink")
def collect_sink(parameter, ds, resume):
    rows = ds.take_all()
    COLLECTED.extend(rows)
    return {"rows": len(rows)}


def double_n(spec):
    HANDLER_TRACE.append("pre")
    spec["job"]["content"]["reader"]["parameter"]["n"] *= 2
    return spec


def note_report(spec, report):
    HANDLER_TRACE.append(("post", report["result"]["rows"]))


@pytest.mark.usefixtures("ray_session")
class TestPluginSpi:
    def test_custom_source_to_custom_sink(self):
        COLLECTED.clear()
        rep = run_job({"job": {"content": {
            "reader": {"name": "range_source", "parameter": {"n": 7}},
            "writer": {"name": "collect_sink", "parameter": {}},
        }}})
        assert rep["ok"] and rep["result"]["rows"] == 7
        assert sorted(r["x"] for r in COLLECTED) == list(range(7))

    def test_unknown_names_still_error(self):
        with pytest.raises(JobError, match="unknown reader"):
            run_job({"job": {"content": {
                "reader": {"name": "nope", "parameter": {}},
                "writer": {"name": "collect_sink", "parameter": {}},
            }}})

    def test_pre_and_post_handlers(self):
        COLLECTED.clear()
        HANDLER_TRACE.clear()
        rep = run_job({"job": {"content": {
            "reader": {"name": "range_source", "parameter": {"n": 3}},
            "writer": {"name": "collect_sink", "parameter": {}},
        }, "setting": {
            "preHandler": "tests.test_plugins:double_n",
            "postHandler": "tests.test_plugins:note_report",
        }}})
        # preHandler doubled n to 6 before the run; postHandler saw the report
        assert rep["result"]["rows"] == 6
        assert HANDLER_TRACE == ["pre", ("post", 6)]
