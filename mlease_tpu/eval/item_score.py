"""Per-item model scoring + per-model-key loglik.

TPU-native ItemModelTest / ItemModelTestLoglik (reference:
src/main/java/com/linkedin/mlease/regression/jobs/ItemModelTest.java:136-212,
ItemModelTestLoglik.java:60-142). The reference shuffles test rows by item key
and has each reducer load only its hash-shard of models
(ReadLinearModelConsumer with hash(itemKey)%nReducers==taskId,
ItemModelTest.java:157-171); rows whose item has no model score with an empty
model (:193-197). Here models live in one host dict and rows are scored in
vectorized batches grouped by item; the multi-model `pred` map output matches
ItemModelTestLoglik's expected input schema (pred: map<string,float>).
"""

from __future__ import annotations

from typing import Any, Iterable, Mapping, Sequence

import numpy as np

from mlease_tpu.core.linear_model import LinearModel
from mlease_tpu.eval.loglik import record_loglik
from mlease_tpu.eval.score import remove_union
from mlease_tpu.io import avro, schemas
from mlease_tpu.io.records import get_response, normalize_row


def score_item_records(models: Mapping[str, LinearModel],
                       records: Sequence[Mapping], *, item_key: str,
                       model_prefixes: Sequence[str],
                       ignore_value: bool = False) -> list[dict]:
    """Score each record with every model "prefix#item" for its item.

    Returns records + {"pred": {prefix: xbeta}}. Missing models behave as the
    empty model (pred = offset), as in ItemModelTest.java:193-197.
    """
    empty = LinearModel()
    out = []
    for rec in records:
        item = rec.get(item_key)
        if item is None:
            raise ValueError(f"item key column {item_key!r} missing in record")
        item = str(item)
        row = normalize_row(rec, ignore_value=ignore_value)
        preds = {}
        for prefix in model_prefixes:
            model = models.get(f"{prefix}#{item}", empty)
            preds[prefix] = float(np.float32(
                model.eval_instance(row, loglik=False)))
        r = dict(rec)
        r["pred"] = preds
        out.append(r)
    return out


def item_test_output_schema(input_schema: Any) -> dict:
    base = remove_union(input_schema)
    return {
        "type": "record",
        "name": "PerItemTestOutput",
        "namespace": "com.linkedin.lab.regression.avro",
        "fields": [{"name": f["name"], "type": f["type"]}
                   for f in base["fields"]]
        + [{"name": "pred", "type": {"type": "map", "values": "float"}}],
    }


def aggregate_item_loglik(scored_records: Iterable[Mapping]) -> list[dict]:
    """Per model key: {key, testLoglik: sum/sum_w, count: sum_w}
    (ItemModelTestLoglik.java:98-142)."""
    sums: dict[str, float] = {}
    counts: dict[str, float] = {}
    for rec in scored_records:
        response = get_response(rec)
        w = rec.get("weight")
        weight = 1.0 if w is None else float(w)
        for key, pred in rec["pred"].items():
            sums[key] = sums.get(key, 0.0) + record_loglik(response,
                                                           float(pred), weight)
            counts[key] = counts.get(key, 0.0) + weight
    return [{"key": k, "testLoglik": sums[k] / counts[k], "count": counts[k]}
            for k in sorted(sums)]


def run_item_model_test(records: Sequence[Mapping], input_schema: Any,
                        models: Mapping[str, LinearModel], out_path: str, *,
                        item_key: str, model_prefixes: Sequence[str],
                        ignore_value: bool = False) -> list[dict]:
    scored = score_item_records(models, records, item_key=item_key,
                                model_prefixes=model_prefixes,
                                ignore_value=ignore_value)
    avro.write_records(out_path, item_test_output_schema(input_schema), scored)
    return scored


def run_item_model_test_loglik(scored_records: Iterable[Mapping],
                               out_path: str) -> list[dict]:
    agg = aggregate_item_loglik(scored_records)
    avro.write_records(out_path, schemas.REGRESSION_TEST_LOGLIK_OUTPUT, agg)
    return agg
