"""Conformance tests for the vendored protobuf wire-format shim
(tcdb_spark/_vendor/protobuf_shim) against BOTH the spec and the JVM's
own generated classes.

Layers:
1. pure-Python wire invariants (varint edges, sign extension, zigzag,
   packed repeated, unknown-field skip, oneof displacement, proto3
   default omission) — spec-derived, no Spark needed;
2. pb2-module compatibility: pyspark's generated StateMessage_pb2
   executes unmodified against the shim runtime;
3. JVM round-trip: every request shape the stateful-processor client
   sends must parse AND re-serialize BYTE-IDENTICALLY through
   protobuf-java (the spark-sql jar's StateMessage$* classes), and
   Java-built responses must parse correctly in the shim — this is the
   oracle the pure-Python layers cannot provide;
4. worker-side visibility: a mapInPandas task imports google.protobuf,
   proving the PYTHONPATH plumbing reaches executor Python workers.

The end-to-end attestation (a transformWithStateInPandas query folding
ValueState across a checkpoint restart on RocksDB) lives in
tests/test_stateful_streaming.py::test_running_peak_transform_with_state,
which un-skipped the moment the shim landed.
"""

from __future__ import annotations

import pytest

from tcdb_spark.streaming.proto_compat import ensure_protobuf

MODE = ensure_protobuf()


def _wire():
    import sys

    from tcdb_spark.streaming.proto_compat import VENDOR_DIR

    if VENDOR_DIR not in sys.path:
        sys.path.insert(0, VENDOR_DIR)
    from google.protobuf import _shim_wire as w  # type: ignore

    return w


def _pb2():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


# --------------------------------------------------------------------------
# layer 1: wire invariants (run only when the shim is the active runtime)
# --------------------------------------------------------------------------

pytestmark = pytest.mark.skipif(
    MODE == "native",
    reason="real protobuf installed: the shim never activates, nothing to pin",
)


def test_varint_edges():
    w = _wire()
    for n in (0, 1, 127, 128, 300, 2**31 - 1, 2**32, 2**63 - 1):
        buf = w.encode_varint(n)
        val, pos = w.read_varint(buf, 0)
        assert val == n and pos == len(buf)
    # negative int64: 10-byte two's complement
    buf = w.encode_varint(-1)
    assert len(buf) == 10
    assert w._varint_to_value(w.TYPE_INT64, w.read_varint(buf, 0)[0]) == -1
    assert w._varint_to_value(w.TYPE_INT32, w.read_varint(buf, 0)[0]) == -1


def test_zigzag():
    w = _wire()
    for n in (0, -1, 1, -2, 2, -(2**31), 2**31 - 1, -(2**62)):
        assert w._zigzag_decode(w._zigzag_encode(n)) == n


def test_proto3_default_omission_and_oneof_presence():
    sm = _pb2()
    # default scalar omitted: version=0 serializes to b""
    assert sm.StateRequest(version=0).SerializeToString() == b""
    assert sm.StateRequest(version=1).SerializeToString() == b"\x08\x01"
    # oneof member present even when its submessage is empty
    req = sm.StateRequest(statefulProcessorCall=sm.StatefulProcessorCall())
    assert req.SerializeToString() == b"\x12\x00"


def test_oneof_displacement():
    sm = _pb2()
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(),
        version=3,
    )
    req.timerRequest = sm.TimerRequest()
    assert req.WhichOneof("method") == "timerRequest"
    data = req.SerializeToString()
    rt = sm.StateRequest.FromString(data)
    assert rt.WhichOneof("method") == "timerRequest"
    assert rt.version == 3
    assert not rt.HasField("statefulProcessorCall")


def test_unknown_field_skipped():
    sm = _pb2()
    w = _wire()
    # field 1000 (unknown to StateRequest) followed by a real version field
    unknown = w.encode_varint((1000 << 3) | 0) + w.encode_varint(42)
    data = unknown + b"\x08\x05"
    msg = sm.StateRequest.FromString(data)
    assert msg.version == 5


def test_string_utf8_and_bytes_roundtrip():
    sm = _pb2()
    s = sm.ParseStringSchema(schema="naïve ☂ schema")
    rt = sm.ParseStringSchema.FromString(s.SerializeToString())
    assert rt.schema == "naïve ☂ schema"
    v = sm.ValueStateUpdate(value=b"\x00\xff\x01" * 100)
    assert sm.ValueStateUpdate.FromString(v.SerializeToString()).value == b"\x00\xff\x01" * 100


def test_repeated_message_parse():
    """StateResponseWithMapIterator carries repeated KeyAndValuePair —
    synthesize the wire bytes and parse."""
    sm = _pb2()
    w = _wire()
    pair1 = sm.KeyAndValuePair(key=b"k1", value=b"v1").SerializeToString()
    pair2 = sm.KeyAndValuePair(key=b"k2", value=b"v2").SerializeToString()
    fno = sm.StateResponseWithMapIterator._FIELDS["kvPair"].number
    buf = b"".join(
        w._tag(fno, 2) + w.encode_varint(len(p)) + p for p in (pair1, pair2)
    )
    resp = sm.StateResponseWithMapIterator.FromString(buf)
    assert [(p.key, p.value) for p in resp.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]


def test_enum_module_constants():
    sm = _pb2()
    assert sm.CREATED == sm.HandleState.Value("CREATED")
    assert sm.HandleState.Name(sm.CLOSED) == "CLOSED"


# --------------------------------------------------------------------------
# layers 3-4: JVM oracle + worker visibility (need the shared session)
# --------------------------------------------------------------------------


def _client_request_corpus(sm):
    """Every request SHAPE the pyspark state-server client builds
    (stateful_processor_api_client.py + the three state clients)."""
    return {
        "setHandleState": sm.StateRequest(
            version=1,
            statefulProcessorCall=sm.StatefulProcessorCall(
                setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
            ),
        ),
        "setImplicitKey": sm.StateRequest(
            implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
                setImplicitKey=sm.SetImplicitKey(key=b"\x00\x01\xffkey")
            )
        ),
        "removeImplicitKey": sm.StateRequest(
            implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
                removeImplicitKey=sm.RemoveImplicitKey()
            )
        ),
        "getValueState": sm.StateRequest(
            statefulProcessorCall=sm.StatefulProcessorCall(
                getValueState=sm.StateCallCommand(
                    stateName="peak", schema="v DOUBLE", ttl=sm.TTLConfig(durationMs=60000)
                )
            )
        ),
        "valueGet": sm.StateRequest(
            stateVariableRequest=sm.StateVariableRequest(
                valueStateCall=sm.ValueStateCall(stateName="peak", get=sm.Get())
            )
        ),
        "valueUpdate": sm.StateRequest(
            stateVariableRequest=sm.StateVariableRequest(
                valueStateCall=sm.ValueStateCall(
                    stateName="peak",
                    valueStateUpdate=sm.ValueStateUpdate(value=b"12345678"),
                )
            )
        ),
        "listPut": sm.StateRequest(
            stateVariableRequest=sm.StateVariableRequest(
                listStateCall=sm.ListStateCall(
                    stateName="l",
                    listStatePut=sm.ListStatePut(value=b"payload", fetchWithArrow=True),
                )
            )
        ),
        "mapGetValue": sm.StateRequest(
            stateVariableRequest=sm.StateVariableRequest(
                mapStateCall=sm.MapStateCall(
                    stateName="m", getValue=sm.GetValue(userKey=b"uk")
                )
            )
        ),
        "registerTimer": sm.StateRequest(
            statefulProcessorCall=sm.StatefulProcessorCall(
                timerStateCall=sm.TimerStateCallCommand(
                    register=sm.RegisterTimer(expiryTimestampMs=1723800000000)
                )
            )
        ),
        "expiryTimers": sm.StateRequest(
            timerRequest=sm.TimerRequest(
                expiryTimerRequest=sm.ExpiryTimerRequest(
                    expiryTimestampMs=1723800000000
                )
            )
        ),
        "parseSchema": sm.StateRequest(
            utilsRequest=sm.UtilsRequest(
                parseStringSchema=sm.ParseStringSchema(schema="a INT, b STRING")
            )
        ),
    }


def test_jvm_roundtrip_byte_identical(spark):
    sm = _pb2()
    jvm = spark.sparkContext._jvm
    gw = spark.sparkContext._gateway
    cls = jvm.java.lang.Class.forName(
        "org.apache.spark.sql.execution.streaming.state.StateMessage$StateRequest"
    )
    bytes_cls = jvm.java.lang.Class.forName("[B")
    sig = gw.new_array(jvm.java.lang.Class, 1)
    sig[0] = bytes_cls
    parse = cls.getMethod("parseFrom", sig)
    for label, msg in _client_request_corpus(sm).items():
        mine = msg.SerializeToString()
        args = gw.new_array(jvm.java.lang.Object, 1)
        args[0] = bytearray(mine)
        back = bytes(parse.invoke(None, args).toByteArray())
        assert back == mine, f"{label}: shim={mine.hex()} java={back.hex()}"


def test_jvm_built_response_parses_in_shim(spark):
    sm = _pb2()
    jvm = spark.sparkContext._jvm
    gw = spark.sparkContext._gateway
    sig0 = gw.new_array(jvm.java.lang.Class, 0)
    args0 = gw.new_array(jvm.java.lang.Object, 0)

    def builder(name):
        cls = jvm.java.lang.Class.forName(
            "org.apache.spark.sql.execution.streaming.state.StateMessage$" + name
        )
        return cls.getMethod("newBuilder", sig0).invoke(None, args0)

    b = builder("StateResponse")
    b.setStatusCode(7)
    b.setErrorMessage("boom")
    # ByteString is shaded into the spark-core relocation
    bs_cls = jvm.java.lang.Class.forName(
        "org.sparkproject.spark_core.protobuf.ByteString"
    )
    bytes_cls = jvm.java.lang.Class.forName("[B")
    sigB = gw.new_array(jvm.java.lang.Class, 1)
    sigB[0] = bytes_cls
    argsB = gw.new_array(jvm.java.lang.Object, 1)
    argsB[0] = bytearray(b"\x01\x02\x00\xff")
    b.setValue(bs_cls.getMethod("copyFrom", sigB).invoke(None, argsB))
    r = sm.StateResponse.FromString(bytes(b.build().toByteArray()))
    assert (r.statusCode, r.errorMessage, r.value) == (7, "boom", b"\x01\x02\x00\xff")

    b2 = builder("StateResponseWithLongTypeVal")
    b2.setValue(-9876543210)
    r2 = sm.StateResponseWithLongTypeVal.FromString(bytes(b2.build().toByteArray()))
    assert r2.value == -9876543210 and r2.statusCode == 0


def test_worker_side_import(spark):
    """google.protobuf must be importable in executor Python workers —
    the state-server client runs THERE, not on the driver.  get_spark()
    prepends the vendor dir to PYTHONPATH before the JVM launches, and
    local-mode workers inherit that environment."""
    import pandas as pd

    def probe(batches):
        import google.protobuf  # noqa: F401

        ok = getattr(google.protobuf, "IS_SHIM", False) or True
        for _ in batches:
            pass
        yield pd.DataFrame({"ok": [bool(ok)]})

    out = (
        spark.range(1)
        .mapInPandas(probe, "ok boolean")
        .collect()
    )
    assert out and out[0]["ok"] is True
