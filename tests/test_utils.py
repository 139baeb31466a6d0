"""Observability utilities (SURVEY.md §5 metrics/logging rows)."""

import json

from alacjax.utils import StageTimer, StreamReport, get_logger, stage_annotation


def test_stream_report_aggregates():
    r = StreamReport(channels=2, bit_depth=16, sample_rate=44100,
                     samples=8192, pcm_bytes=8192 * 4, seconds=0.5)
    r.add_packet(1000)
    r.add_packet(3000, escaped=True)
    d = r.to_dict()
    assert d["frames"] == 2
    assert d["packet_bytes"] == 4000
    assert d["max_frame_bytes"] == 3000
    assert d["escape_rate"] == 0.5
    assert abs(d["compression_ratio"] - 4000 / 32768) < 1e-4  # rounded field
    assert d["frames_per_sec"] == 4.0
    assert d["avg_bit_rate"] == 4000 * 8 * 44100 // 8192
    json.loads(r.to_json())  # serializable


def test_stage_timer_shares():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    shares = t.shares()
    assert set(shares) == {"a", "b"}
    assert abs(sum(shares.values()) - 1.0) < 0.01


def test_stage_annotation_is_context_manager():
    with stage_annotation("predict"):
        pass


def test_logger():
    log = get_logger("alacjax.test")
    log.debug("hidden by default")
