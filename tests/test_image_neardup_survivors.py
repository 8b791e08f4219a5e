"""q72: image near-dup clusters + canonical survivors (planted)."""

import numpy as np
import pandas as pd


def test_q72_drops_planted_duplicates(ray_session):
    from searchengine_ray.pipelines.queries import q72_image_neardup_survivors
    from searchengine_ray.sources.synth import gen_images

    out = q72_image_neardup_survivors("/unused")
    assert list(out.columns) == ["fmt", "n_images"]
    assert (out["n_images"] > 0).all()

    images, _ = gen_images(400, seed=42, dup_rate=0.05)
    n_total = images.num_rows
    n_kept = int(out["n_images"].sum())
    # the fixture plants ~5% phash-identical dups; every planted dup
    # collapses into its cluster, so survivors < total and the drop is
    # in the plausible planted band (not the whole corpus)
    assert n_kept < n_total
    assert n_total - n_kept <= int(0.15 * n_total)


def test_q72_deterministic(ray_session):
    from searchengine_ray.pipelines.queries import q72_image_neardup_survivors

    a = q72_image_neardup_survivors("/unused")
    b = q72_image_neardup_survivors("/unused")
    pd.testing.assert_frame_equal(a, b)
