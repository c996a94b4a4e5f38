"""Unit tests for the vendored pure-python protobuf runtime
(vendor/miniproto.py + vendor/state_message_shim.py).

The e2e proof is the transformWithStateInPandas test family in
test_streaming.py (real JVM state server speaking the real wire format);
these tests pin the wire-level details with hand-computed fixtures so a
runtime regression fails fast with a readable diff.
"""

from __future__ import annotations

import pytest

from kafka_denormalization_spark.vendor import miniproto, state_message_shim


# --- wire primitives -------------------------------------------------------


def test_varint_roundtrip():
    for v in (0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -2**63):
        enc = miniproto.encode_varint(v)
        dec, pos = miniproto.decode_varint(enc, 0)
        assert pos == len(enc)
        want = v if v >= 0 else v + (1 << 64)
        assert dec == want


def test_varint_known_vectors():
    # spec examples: 1 -> 01, 300 -> ac 02, -1 -> ten 0xff.. bytes
    assert miniproto.encode_varint(1) == b"\x01"
    assert miniproto.encode_varint(300) == b"\xac\x02"
    assert miniproto.encode_varint(-1) == b"\xff" * 9 + b"\x01"


def test_zigzag():
    for v, z in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2147483647, 4294967294)]:
        assert miniproto._zigzag_encode(v) == z
        assert miniproto._zigzag_decode(z) == v


# --- shim module over the real pyspark descriptor --------------------------


@pytest.fixture(scope="module")
def pb():
    return state_message_shim.build_module()


def test_shim_exposes_client_surface(pb):
    # every name the pyspark state clients reference must exist
    for name in (
        "StateRequest", "StateResponse", "StateResponseWithLongTypeVal",
        "StateResponseWithStringTypeVal", "StateResponseWithListGet",
        "StateResponseWithMapKeysOrValues", "StateResponseWithMapIterator",
        "StateResponseWithTimer", "KeyAndValuePair", "TimerInfo",
        "StatefulProcessorCall", "StateVariableRequest",
        "ImplicitGroupingKeyRequest", "TimerRequest", "UtilsRequest",
        "StateCallCommand", "TimerStateCallCommand", "ValueStateCall",
        "ListStateCall", "MapStateCall", "SetImplicitKey",
        "RemoveImplicitKey", "SetHandleState", "Get", "Exists", "Clear",
        "ValueStateUpdate", "AppendValue", "AppendList", "ListStateGet",
        "ListStatePut", "GetValue", "ContainsKey", "UpdateValue",
        "RemoveKey", "Keys", "Values", "Iterator", "RegisterTimer",
        "DeleteTimer", "ListTimers", "ExpiryTimerRequest",
        "TimerValueRequest", "GetProcessingTime", "GetWatermark",
        "ParseStringSchema",
    ):
        assert hasattr(pb, name), name
    # hoisted HandleState enum constants
    assert pb.PRE_INIT == 0
    assert pb.CREATED == 1
    assert pb.INITIALIZED == 2
    assert pb.CLOSED == 5


def test_handle_state_request_bytes(pb):
    # StateRequest.statefulProcessorCall(=2).setHandleState(=1).state(=2)
    m = pb.StateRequest(
        statefulProcessorCall=pb.StatefulProcessorCall(
            setHandleState=pb.SetHandleState(state=pb.INITIALIZED)
        )
    )
    assert m.SerializeToString() == bytes.fromhex("12040a020802")


def test_proto3_zero_scalar_not_serialized_outside_oneof(pb):
    # state == PRE_INIT (0) is a plain proto3 scalar default -> absent on
    # the wire; the enclosing empty message still serializes as present
    m = pb.StateRequest(
        statefulProcessorCall=pb.StatefulProcessorCall(
            setHandleState=pb.SetHandleState(state=pb.PRE_INIT)
        )
    )
    assert m.SerializeToString() == bytes.fromhex("12020a00")


def test_nested_attribute_write_autovivifies_with_presence(pb):
    scc = pb.StateCallCommand()
    scc.stateName = "s1"
    # reading a submessage does NOT mark it present...
    _ = scc.ttl.durationMs
    assert b"\x22" not in scc.SerializeToString()  # no field-4 tag
    # ...writing does
    scc.ttl.durationMs = 5000
    data = scc.SerializeToString()
    assert data == bytes.fromhex("0a027331") + bytes.fromhex("2203088827")


def test_oneof_last_write_wins(pb):
    call = pb.StatefulProcessorCall(setHandleState=pb.SetHandleState(state=1))
    call.deleteIfExists.stateName = "x"
    data = call.SerializeToString()
    # only the deleteIfExists branch (field 6) remains
    assert data.startswith(b"\x32")
    assert b"\x0a" not in data[:1]


def test_response_parse_all_fields(pb):
    # statusCode=3, errorMessage="bad", value=b"\x01\x02"
    payload = bytes.fromhex("0803") + b"\x12\x03bad" + b"\x1a\x02\x01\x02"
    r = pb.StateResponse()
    r.ParseFromString(payload)
    assert (r.statusCode, r.errorMessage, r.value) == (3, "bad", b"\x01\x02")


def test_response_parse_defaults_when_absent(pb):
    r = pb.StateResponse()
    r.ParseFromString(b"")
    assert (r.statusCode, r.errorMessage, r.value) == (0, "", b"")


def test_repeated_bytes_value(pb):
    r = pb.StateResponseWithListGet()
    r.ParseFromString(b"\x1a\x01a" + b"\x1a\x01b" + b"\x20\x01")
    assert list(r.value) == [b"a", b"b"]
    assert r.requireNextFetch is True


def test_repeated_message_roundtrip(pb):
    r = pb.StateResponseWithTimer()
    t1 = pb.TimerInfo(timestampMs=1234)
    t2 = pb.TimerInfo(key=b"k", timestampMs=-1)
    r.timer.extend([t1, t2])
    r2 = pb.StateResponseWithTimer()
    r2.ParseFromString(r.SerializeToString())
    assert [(t.key, t.timestampMs) for t in r2.timer] == [(b"", 1234), (b"k", -1)]


def test_negative_int64_varint(pb):
    t = pb.TimerInfo(timestampMs=-7)
    out = pb.TimerInfo()
    out.ParseFromString(t.SerializeToString())
    assert out.timestampMs == -7


def test_unknown_fields_skipped(pb):
    # field 15 varint + a valid statusCode: parser must skip the unknown
    payload = b"\x78\x2a" + bytes.fromhex("0805")
    r = pb.StateResponse()
    r.ParseFromString(payload)
    assert r.statusCode == 5


def test_unknown_attribute_raises(pb):
    with pytest.raises(AttributeError):
        pb.StateResponse().nope
    with pytest.raises(AttributeError):
        pb.StateResponse(nope=1)


def test_descriptor_parse_matches_pyi_field_numbers(pb):
    fields = pb.StateRequest._fields_by_name
    assert fields["version"].number == 1
    assert fields["statefulProcessorCall"].number == 2
    assert fields["utilsRequest"].number == 6
    # oneof membership: the five request branches share a oneof
    idx = {fields[n].oneof_index for n in (
        "statefulProcessorCall", "stateVariableRequest",
        "implicitGroupingKeyRequest", "timerRequest", "utilsRequest")}
    assert len(idx) == 1 and None not in idx


def test_finder_registered_by_sitecustomize():
    """engine.get_spark propagates the repo root on PYTHONPATH so worker
    interpreters import sitecustomize; in-process we can at least assert
    the module registers the finder idempotently."""
    import importlib
    import sys

    import sitecustomize

    importlib.reload(sitecustomize)
    importlib.reload(sitecustomize)
    finders = [
        f for f in sys.meta_path if type(f).__name__ == "_StateMessageShimFinder"
    ]
    assert len(finders) == 1
