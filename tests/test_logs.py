"""Combined access-log + RFC 5424 syslog tokenizers."""

import pytest

from health_monitor_cc_flink_spark.operators.logs import (
    format_combined_log,
    format_syslog_5424,
    parse_combined_log,
    parse_syslog_5424,
)


def test_combined_roundtrip_with_escapes():
    f = {"host": "203.0.113.9", "ident": None, "authuser": "alice",
         "timestamp": "01/Jan/2026:00:00:07 +0000", "method": "GET",
         "target": "/a/b?q=1", "protocol": "HTTP/1.1", "status": 200,
         "n_bytes": 1234, "referer": 'http://r/"x"',
         "user_agent": 'UA \\ with "quotes"'}
    g = parse_combined_log(format_combined_log(f))
    for k, v in f.items():
        assert g[k] == v, k


def test_combined_nil_fields():
    f = {"host": "h", "timestamp": "t", "method": "POST",
         "target": "/", "protocol": "HTTP/2", "status": 204,
         "n_bytes": None, "referer": None, "user_agent": "ua"}
    g = parse_combined_log(format_combined_log(f))
    assert g["n_bytes"] is None and g["referer"] is None
    assert g["ident"] is None and g["authuser"] is None


@pytest.mark.parametrize("line", [
    "too short",
    'h - - 01/Jan "GET / HTTP/1.1" 200 1 "-" "ua"',     # no bracket
    'h - - [t] "GET /" 200 1 "-" "ua"',                 # 2-part request
    'h - - [t] "GET / HTTP/1.1" abc 1 "-" "ua"',        # bad status
    'h - - [t] "GET / HTTP/1.1" 200 1 "-" "ua" extra',  # trailing
    'h - - [t] "GET / HTTP/1.1" 200 1 "-" "unterminated',
])
def test_combined_malformed_rejected(line):
    with pytest.raises(ValueError):
        parse_combined_log(line)


def test_syslog_roundtrip():
    f = {"facility": 4, "severity": 2, "timestamp": "2026-01-01T00:00:07Z",
         "hostname": "h7", "app": "crawler", "procid": "123",
         "msgid": "FETCH",
         "sd": {"meta@32473": {"url": 'http://x/"q"', "depth": "3"}},
         "msg": "fetched ok"}
    g = parse_syslog_5424(format_syslog_5424(f))
    assert g["facility"] == 4 and g["severity"] == 2
    assert g["sd"]["meta@32473"]["url"] == 'http://x/"q"'
    assert g["msg"] == "fetched ok"
    assert g["procid"] == "123" and g["msgid"] == "FETCH"


def test_syslog_nil_sd_and_headers():
    g = parse_syslog_5424("<13>1 - - - - - - hello world")
    assert g["facility"] == 1 and g["severity"] == 5
    assert g["timestamp"] is None and g["hostname"] is None
    assert g["sd"] == {} and g["msg"] == "hello world"


@pytest.mark.parametrize("line", [
    "no pri at all",
    "<999>1 - - - - - - m",          # PRI out of range
    "<13>2 - - - - - - m",           # unsupported version
    '<13>1 - - - - - [sd x="1" m',   # unterminated SD
])
def test_syslog_malformed_rejected(line):
    with pytest.raises(ValueError):
        parse_syslog_5424(line)
