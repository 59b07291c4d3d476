"""Scaling harness on the virtual 8-device mesh: structure, not speed."""

from shwd_tpu.parallel.scaling import measure_scaling


def test_scaling_harness_runs_and_reports():
    pts = measure_scaling(device_counts=[1, 2], per_device_batch=2,
                          n_points=16, num_projections=4, steps=1,
                          verbose=False)
    assert [p.devices for p in pts] == [1, 2]
    assert pts[0].efficiency == 1.0
    for p in pts:
        assert p.clouds_per_second > 0
        assert p.step_seconds > 0
    # total batch doubles with devices (weak scaling)
    assert pts[1].clouds_per_second > 0
