"""Pin-regeneration round-trip: on the unchanged corpora, `python -m
tokenzip pins` must recompute every pinned oracle constant to exactly its
committed value (changed == False for all). A failure here means a pin is
stale (corpus / selector / estimator drift) — regenerate with
`python -m tokenzip pins` and review the diff."""


def test_pins_round_trip_unchanged(ray_session):
    from tokenzip.pins import regenerate

    res = regenerate(write=False)
    assert set(res) == {
        "DISTINCT_HLL_PIN",
        "COMPRESSION_BY_CODEC_PIN",
        "EMB_TOPK_IVF_PIN",
        "EMB_DEDUP_IVF_PIN",
        "KMEANS_SIZES_PIN",
    }
    stale = {k: v["value"] for k, v in res.items() if v["changed"]}
    assert not stale, f"stale pins (run `python -m tokenzip pins`): {stale}"
