"""Simulator-port fidelity: generated distributions must respect the
reference's documented bounds and frequencies (FIXTURES.md A1)."""

import numpy as np

from health_monitor_cc_flink_spark.fixtures import generate_health_events_pdf


def test_value_bounds_and_option_grids():
    pdf = generate_health_events_pdf(n_ticks=600, interval_s=0.5, seed=123)
    healthy = pdf[pdf.patient_id != 1]
    assert healthy.heart_rate.between(55, 150).all()
    assert (healthy.heart_rate % 5 == 0).all()
    assert pdf.blood_oxygen_spO2.between(82, 100).all()
    assert (pdf.blood_oxygen_spO2 % 2 == 0).all()
    assert pdf.systolic.between(90, 180).all()
    assert pdf.diastolic.between(60, 120).all()
    assert pdf.body_temperature_c.between(35.0, 40.0).all()
    assert pdf.battery_level.between(5, 100).all()
    assert pdf.event_id.str.len().eq(12).all()


def test_sensor_status_weights():
    pdf = generate_health_events_pdf(n_ticks=2000, interval_s=0.5, seed=7)
    freq = pdf.sensor_status.value_counts(normalize=True)
    assert abs(freq["stable"] - 0.80) < 0.03
    assert abs(freq["noisy"] - 0.15) < 0.03
    assert abs(freq["offline"] - 0.05) < 0.02


def test_bradycardia_glide_shape():
    pdf = generate_health_events_pdf(n_ticks=600, interval_s=0.5, seed=42)
    p1 = pdf[pdf.patient_id == 1].sort_values("event_time")
    t = np.arange(len(p1)) * 0.5
    before = p1.heart_rate[t < 30]
    after_floor = p1.heart_rate[t > 240]
    assert before.mean() > 55
    assert after_floor.mean() < 30  # glide floor ~20 bpm
    assert p1.heart_rate.min() >= 20


def test_determinism():
    a = generate_health_events_pdf(n_ticks=100, seed=9)
    b = generate_health_events_pdf(n_ticks=100, seed=9)
    assert a.equals(b)
    c = generate_health_events_pdf(n_ticks=100, seed=10)
    assert not a.heart_rate.equals(c.heart_rate)
