"""SRT/WebVTT subtitle writer unit tests (whisper_tpu/bench/subtitles.py).

Beyond-reference surface — format strings follow the de-facto SRT and
WebVTT specs (openai-whisper's srt/vtt writers are the behavioral model).
"""

from whisper_tpu.bench.subtitles import (
    Cue,
    cues_from_segments,
    cues_from_words,
    format_srt,
    format_vtt,
    write_subtitles,
)


def _w(word, start, end):
    return {"word": word, "start": start, "end": end}


class TestCueGrouping:
    def test_single_cue(self):
        cues = cues_from_words([_w(" hello", 0.0, 0.4), _w(" world", 0.5, 0.9)])
        assert cues == [Cue(0.0, 0.9, "hello world")]

    def test_gap_splits(self):
        cues = cues_from_words(
            [_w(" a", 0.0, 0.2), _w(" b", 2.0, 2.2)], max_gap_s=1.0
        )
        assert len(cues) == 2
        assert cues[0].text == "a" and cues[1].text == "b"
        assert cues[1].start_s == 2.0

    def test_max_chars_splits(self):
        words = [_w(f" w{i}", i * 0.1, i * 0.1 + 0.05) for i in range(30)]
        cues = cues_from_words(words, max_chars=12)
        assert len(cues) > 1
        assert all(len(c.text) <= 12 for c in cues)

    def test_max_duration_splits(self):
        words = [_w(" x", t, t + 0.4) for t in range(0, 20, 1)]
        cues = cues_from_words(words, max_dur_s=5.0, max_gap_s=2.0)
        assert all(c.end_s - c.start_s <= 5.0 for c in cues)

    def test_empty_words_skipped(self):
        assert cues_from_words([_w("  ", 0, 1)]) == []
        assert cues_from_words([]) == []

    def test_segments(self):
        from whisper_tpu.pipeline.sequential import Segment

        segs = [
            Segment(0.0, 2.0, [], " first"),
            Segment(2.0, 2.5, [], "   "),  # empty text dropped
            Segment(2.5, 4.0, [], " second"),
        ]
        cues = cues_from_segments(segs)
        assert [c.text for c in cues] == ["first", "second"]
        assert cues[1].start_s == 2.5


class TestFormats:
    CUES = [Cue(0.0, 1.5, "hello"), Cue(61.25, 3661.075, "world")]

    def test_srt(self):
        out = format_srt(self.CUES)
        assert out == (
            "1\n00:00:00,000 --> 00:00:01,500\nhello\n"
            "\n"
            "2\n00:01:01,250 --> 01:01:01,075\nworld\n"
        )

    def test_vtt(self):
        out = format_vtt(self.CUES)
        assert out.startswith("WEBVTT\n\n")
        assert "00:00:00.000 --> 00:00:01.500\nhello\n" in out
        assert "00:01:01.250 --> 01:01:01.075\nworld\n" in out

    def test_write_by_extension(self, tmp_path):
        p_srt = str(tmp_path / "a.srt")
        p_vtt = str(tmp_path / "a.vtt")
        write_subtitles(p_srt, self.CUES)
        write_subtitles(p_vtt, self.CUES)
        assert open(p_srt).read() == format_srt(self.CUES)
        assert open(p_vtt).read() == format_vtt(self.CUES)

    def test_unknown_extension(self, tmp_path):
        import pytest

        with pytest.raises(ValueError):
            write_subtitles(str(tmp_path / "a.sub"), self.CUES)

    def test_negative_time_clamped(self):
        assert "00:00:00,000" in format_srt([Cue(-0.5, 0.1, "x")])
