"""plan_fingerprint (bench.py's config artifact) must track the real
kernel planner: these goldens pin the headline-bench shapes so silent
planner drift shows up as a test failure next to the bench JSON that
would change with it (VERDICT r3 #6)."""

from knn_for_homology_tpu.ops.exact_pallas import plan_fingerprint


def test_headline_approx_sq8():
    fp = plan_fingerprint(
        131072, 1024, 1000, storage="sq8-sym", recall_target=0.98
    )
    assert fp == {
        "db_tile": 256,
        "query_block": 512,
        "r_slots": 7,
        "storage": "sq8-sym",
    }


def test_headline_exact_bf16():
    fp = plan_fingerprint(131072, 1024, 1000, exact=True, itemsize=2)
    assert fp == {
        "db_tile": 256,
        "query_block": 240,
        "r_slots": 16,
        "storage": "native",
    }


def test_quick_shape():
    fp = plan_fingerprint(
        2048, 128, 100, storage="sq8-sym", recall_target=0.98
    )
    assert fp == {
        "db_tile": 256,
        "query_block": 512,
        "r_slots": 3,
        "storage": "sq8-sym",
    }


def test_exact_small_k_keeps_wide_tile():
    # small k keeps the 1024-wide tile (matches exact_pallas_topk's
    # k-adaptive default)
    fp = plan_fingerprint(131072, 1024, 10, exact=True, itemsize=2)
    assert fp["db_tile"] == 1024
