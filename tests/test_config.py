"""Config-driven pipeline factory (P1-P6): autoload, inheritance, gating,
transform registry."""

from __future__ import annotations

import pytest

from log_agent_spark.config import BizConfig, autoload, get_transform, register_transform
from log_agent_spark.functions.paths import bsi_parse

INI = """
[GLOBAL]
switch = on

[KAFKA]
brokers = kafka1:9092
topic = logfile

[CASSANDRA]
hosts = cass1
keyspace = logs

[BSI.ICT]
watch = /data/ict
patterns = .*\\.log$
ignores = ^~
max_nesting_level = 5
debounce = 2000
kafka_topic = ict_topic

[SPI.DAT]
watch = /data/spi
debounce = 0

[OFF.ONE]
watch = /data/off
switch = off

[NOT_A_PIPELINE]
foo = bar
"""


@pytest.fixture()
def ini_path(tmp_path):
    p = tmp_path / "logagent.ini"
    p.write_text(INI)
    return str(p)


def test_autoload_sections_and_gating(ini_path):
    cfgs = {c.name: c for c in autoload(ini_path)}
    # watch-bearing + switched-on sections only (plugin.go:195-205, 57-64)
    assert set(cfgs) == {"BSI.ICT", "SPI.DAT"}
    bsi = cfgs["BSI.ICT"]
    assert bsi.plugin == "BSI"
    assert bsi.patterns == r".*\.log$"
    assert bsi.max_nesting_level == 5
    assert bsi.debounce_ms == 2000
    # globals inherited, per-section kafka_* overrides win (plugin.go:207-211)
    assert bsi.kafka["brokers"] == "kafka1:9092"
    assert bsi.kafka["topic"] == "ict_topic"
    assert bsi.cassandra == {"hosts": "cass1", "keyspace": "logs"}
    # defaults (plugin.go:122): debounce 3000 unless set; SPI set 0 = bypass
    assert cfgs["SPI.DAT"].debounce_ms == 0
    assert cfgs["SPI.DAT"].kafka["topic"] == "logfile"


def test_global_switch_off(tmp_path):
    p = tmp_path / "off.ini"
    p.write_text("[GLOBAL]\nswitch = off\n\n[BSI.X]\nwatch = /x\n")
    assert autoload(str(p)) == []


def test_transform_registry():
    # BSI → bsi_parse; unknown prefix → identity (SPI.go:1-11 precedent)
    assert get_transform("BSI") is bsi_parse
    assert get_transform("bsi") is bsi_parse
    ident = get_transform("SPI")
    sentinel = object()
    assert ident(sentinel) is sentinel

    @register_transform("CUSTOM")
    def my_transform(df):
        return df

    assert get_transform("CUSTOM") is my_transform
    assert BizConfig(name="CUSTOM.A", watch="/x").transform is my_transform


def test_validate_rejects_bad_config():
    with pytest.raises(ValueError, match="watch"):
        BizConfig(name="X", watch="").validate()
    with pytest.raises(ValueError, match="debounce"):
        BizConfig(name="X", watch="/x", debounce_ms=-1).validate()
