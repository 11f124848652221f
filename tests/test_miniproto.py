"""Unit tests for the vendored miniproto protobuf runtime.

miniproto (vendor/miniproto) exists to run pyspark's generated
StateMessage_pb2 module — the transformWithStateInPandas JVM<->Python
state protocol — in environments without the protobuf distribution.
These tests pin the wire format against HAND-COMPUTED golden bytes
(from the public protobuf encoding spec), so encode and decode are not
merely checked against each other, and pin the exact protobuf behaviors
the pyspark state clients rely on (lazy submessage attach, oneof
clearing, proto3 presence, repeated fields).
"""

from __future__ import annotations

import pytest

from flink_stream_processing_refarch_spark.vendorpath import ensure_protobuf

pytestmark = pytest.mark.skipif(
    not ensure_protobuf(), reason="no protobuf runtime (vendor tree missing?)"
)


def _sm():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


# ---------------------------------------------------------------------------
# golden wire bytes (hand-computed per the public encoding spec)
# ---------------------------------------------------------------------------


def test_set_handle_state_golden_bytes():
    sm = _sm()
    # StateRequest.statefulProcessorCall = field 2, LEN
    #   StatefulProcessorCall.setHandleState = field 1, LEN
    #     SetHandleState.state = field 1, VARINT, CREATED=1
    msg = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    assert msg.SerializeToString() == bytes.fromhex("12040a020801")


def test_pre_init_enum_is_proto3_default_omitted():
    sm = _sm()
    # PRE_INIT = 0: plain (non-oneof) enum at default value is absent on
    # the wire; SetHandleState itself still serializes as an empty
    # submessage because it IS a oneof member.
    msg = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.PRE_INIT)
        )
    )
    assert msg.SerializeToString() == bytes.fromhex("12020a00")


def test_value_state_update_golden_bytes():
    sm = _sm()
    # ValueStateUpdate.value = field 1, LEN, b"\x01\x02"
    upd = sm.ValueStateUpdate(value=b"\x01\x02")
    assert upd.SerializeToString() == bytes.fromhex("0a020102")


def test_register_timer_negative_int64_ten_byte_varint():
    sm = _sm()
    # int64 -1 encodes as 10-byte two's-complement varint
    reg = sm.RegisterTimer(expiryTimestampMs=-1)
    assert reg.SerializeToString() == bytes.fromhex("08ffffffffffffffffff01")
    back = sm.RegisterTimer()
    back.ParseFromString(reg.SerializeToString())
    assert back.expiryTimestampMs == -1


def test_string_field_utf8_golden():
    sm = _sm()
    cmd = sm.StateCallCommand(stateName="aé")  # 'aé' -> 61 c3 a9
    assert cmd.SerializeToString() == bytes.fromhex("0a0361c3a9")


# ---------------------------------------------------------------------------
# semantics the pyspark state clients depend on
# ---------------------------------------------------------------------------


def test_lazy_submessage_read_does_not_attach_write_does():
    sm = _sm()
    cmd = sm.StateCallCommand()
    _ = cmd.ttl.durationMs  # read-only traversal
    assert cmd.SerializeToString() == b""
    assert not cmd.HasField("ttl")
    cmd.ttl.durationMs = 60000  # the exact pattern in get_value_state()
    assert cmd.HasField("ttl")
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.ttl.durationMs == 60000


def test_oneof_set_clears_siblings_and_whichoneof():
    sm = _sm()
    call = sm.ValueStateCall(stateName="s", get=sm.Get())
    assert call.WhichOneof("method") == "get"
    call2 = sm.ValueStateCall(
        stateName="s", valueStateUpdate=sm.ValueStateUpdate(value=b"x")
    )
    assert call2.WhichOneof("method") == "valueStateUpdate"
    # building through ParseFromString keeps exactly one member
    back = sm.ValueStateCall()
    back.ParseFromString(call.SerializeToString())
    assert back.WhichOneof("method") == "get"
    assert not back.HasField("valueStateUpdate")


def test_empty_oneof_member_message_serializes_present():
    sm = _sm()
    # Exists carries no fields; as a oneof member its presence IS the
    # payload. tag(2)=0x12, len=0
    call = sm.ValueStateCall(exists=sm.Exists())
    data = call.SerializeToString()
    back = sm.ValueStateCall()
    back.ParseFromString(data)
    assert back.WhichOneof("method") == "exists"


def test_repeated_bytes_roundtrip_and_default_bool_omitted():
    sm = _sm()
    put = sm.ListStatePut(value=[b"a", b"bb", b""], fetchWithArrow=False)
    data = put.SerializeToString()
    # False == proto3 default -> absent; three LEN entries for field 1
    assert data == bytes.fromhex("0a01610a0262620a00")
    back = sm.ListStatePut()
    back.ParseFromString(data)
    assert list(back.value) == [b"a", b"bb", b""]
    assert back.fetchWithArrow is False


def test_repeated_message_with_proto3_optional_presence():
    sm = _sm()
    resp = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[sm.TimerInfo(key=b"k", timestampMs=9), sm.TimerInfo(timestampMs=7)],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithTimer()
    back.ParseFromString(resp.SerializeToString())
    assert [(t.key, t.timestampMs) for t in back.timer] == [(b"k", 9), (b"", 7)]
    # proto3 `optional bytes key` tracks explicit presence
    assert back.timer[0].HasField("key")
    assert not back.timer[1].HasField("key")
    assert back.requireNextFetch is True


def test_kv_pair_iterator_response_shape():
    sm = _sm()
    resp = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[sm.KeyAndValuePair(key=b"k1", value=b"v1")],
        requireNextFetch=False,
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == [(b"k1", b"v1")]


def test_unknown_fields_are_skipped():
    sm = _sm()
    # field 15 varint (tag 0x78) + field 14 LEN "xx" (tag 0x72) are not in
    # ValueStateUpdate; the known field 1 after them must still decode.
    data = bytes.fromhex("7805" + "72027878" + "0a0179")
    upd = sm.ValueStateUpdate()
    upd.ParseFromString(data)
    assert upd.value == b"y"


def test_parse_resets_previous_state():
    sm = _sm()
    upd = sm.ValueStateUpdate(value=b"old")
    upd.ParseFromString(b"")  # empty message
    assert upd.value == b""


def test_composite_and_repeated_assignment_rejected():
    sm = _sm()
    req = sm.StateRequest()
    with pytest.raises(AttributeError):
        req.statefulProcessorCall = sm.StatefulProcessorCall()
    resp = sm.StateResponseWithListGet()
    with pytest.raises(AttributeError):
        resp.value = [b"x"]
    with pytest.raises(AttributeError):
        req.no_such_field  # noqa: B018


def test_descriptor_parse_of_real_statemessage_file():
    sm = _sm()
    d = sm.StateRequest.DESCRIPTOR
    assert d.fields_by_name["version"].number == 1
    assert d.fields_by_name["statefulProcessorCall"].number == 2
    assert [f.name for f in d.oneofs_by_name["method"].fields] == [
        "statefulProcessorCall",
        "stateVariableRequest",
        "implicitGroupingKeyRequest",
        "timerRequest",
        "utilsRequest",
    ]
    # top-level enum exported both as wrapper and module constants
    assert sm.HandleState.Value("CLOSED") == 5 == sm.CLOSED
    assert sm.HandleState.Name(2) == "INITIALIZED"


def test_real_protobuf_wins_policy():
    """The vendor dir must be APPENDED to sys.path, never prepended, so a
    real protobuf install (absent in this container, but present in
    production clusters) takes priority."""
    import sys

    from flink_stream_processing_refarch_spark import vendorpath

    if vendorpath._VENDOR_DIR in sys.path:
        import google.protobuf as gp

        if gp.__file__.startswith(vendorpath._VENDOR_DIR):
            assert sys.path.index(vendorpath._VENDOR_DIR) > 0
            assert sys.path[0] != vendorpath._VENDOR_DIR
