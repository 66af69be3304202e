import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from propertygraph_spark.kernel.extract import extract_document  # noqa: E402


def extract(src: str, doc_id: str = "d"):
    nodes, triples, mentions, err = extract_document(doc_id, src)
    assert err is None, err
    return nodes, triples


def edge_set(src: str, pred_prefix: str):
    """Return {(subj_text, pred, obj_text, label)} for one-method sources."""
    nodes, triples = extract(src)
    id2text = {n["node_id"]: n["text"] for n in nodes}
    return {
        (id2text[t["subj"]], t["pred"], id2text[t["obj"]], t["label"])
        for t in triples
        if t["pred"].startswith(pred_prefix)
    }


def wrap(body: str) -> str:
    return "class A {\n    void f(int x) {\n%s\n    }\n}" % body


# ---------------------------------------------------------------- spark

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    """Shared local Spark session for integration tests (small but real:
    shuffles, AQE, Arrow all active)."""
    from propertygraph_spark.pipeline.session import get_spark
    s = get_spark("tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()
