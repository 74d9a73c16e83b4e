"""Unit tests for the vendored minimal protobuf runtime
(``_vendor/protoshim``) against the REAL protoc-generated
``StateMessage_pb2`` module PySpark ships — the shim must make that
untouched generated file importable and wire-correct, because the JVM
state server parses what it serializes."""

from __future__ import annotations

import os
import sys

import pytest

_SHIM = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pyspark_excel_datasource_spark",
    "_vendor",
    "protoshim",
)


@pytest.fixture(scope="module")
def sm():
    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError:
        sys.path.append(_SHIM)
    import pyspark.sql.streaming.proto.StateMessage_pb2 as stateMessage

    return stateMessage


def test_generated_module_loads(sm):
    assert hasattr(sm, "StateRequest")
    assert hasattr(sm, "StateResponse")
    # file-level enum values exported as module constants
    assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED) == (0, 1, 2)
    assert (sm.DATA_PROCESSED, sm.TIMER_PROCESSED, sm.CLOSED) == (3, 4, 5)


def test_nested_autovivify_and_roundtrip(sm):
    cmd = sm.StateCallCommand()
    cmd.stateName = "totals"
    cmd.schema = '{"type":"struct","fields":[]}'
    cmd.ttl.durationMs = 60000  # the generated-code nested-write pattern
    msg = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd)
    )
    data = msg.SerializeToString()
    assert isinstance(data, bytes) and data

    back = sm.StateRequest()
    back.ParseFromString(data)
    got = back.statefulProcessorCall.getValueState
    assert got.stateName == "totals"
    assert got.schema == '{"type":"struct","fields":[]}'
    assert got.ttl.durationMs == 60000


def test_proto3_defaults_not_serialized(sm):
    # scalar defaults are omitted on the wire (proto3 implicit presence)
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"") \
        .SerializeToString() == b""
    assert sm.SetHandleState(state=sm.PRE_INIT).SerializeToString() == b""
    # ...but non-defaults serialize and parse back
    r = sm.StateResponse()
    r.ParseFromString(
        sm.StateResponse(statusCode=2, errorMessage="boom", value=b"\x01").SerializeToString()
    )
    assert (r.statusCode, r.errorMessage, r.value) == (2, "boom", b"\x01")


def test_negative_int64_varint(sm):
    t = sm.TimerInfo(timestampMs=-987654321)
    r = sm.TimerInfo()
    r.ParseFromString(t.SerializeToString())
    assert r.timestampMs == -987654321
    # 10-byte two's-complement varint, as the spec requires
    assert len(t.SerializeToString()) == 1 + 10


def test_repeated_bytes_and_bool(sm):
    resp = sm.StateResponseWithListGet(
        statusCode=0, value=[b"row1", b"row2", b""], requireNextFetch=True
    )
    r = sm.StateResponseWithListGet()
    r.ParseFromString(resp.SerializeToString())
    assert list(r.value) == [b"row1", b"row2", b""]
    assert r.requireNextFetch is True
    # unset repeated reads as empty
    assert list(sm.StateResponseWithListGet().value) == []


def test_repeated_nested_messages(sm):
    resp = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=False,
    )
    r = sm.StateResponseWithMapIterator()
    r.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in r.kvPair] == [(b"k1", b"v1"), (b"k2", b"v2")]


def test_unknown_fields_skipped(sm):
    # a future server may add fields; parsing must skip, not crash:
    # append an unknown varint field (#15) and an unknown len field (#14)
    base = sm.StateResponse(statusCode=1, errorMessage="e").SerializeToString()
    extra = bytes([15 << 3 | 0, 42, 14 << 3 | 2, 3]) + b"xyz"
    r = sm.StateResponse()
    r.ParseFromString(base + extra)
    assert (r.statusCode, r.errorMessage) == (1, "e")


def test_oneof_style_requests_serialize_one_branch(sm):
    # oneof members are plain fields on the wire; the client only ever
    # sets one — verify a single branch appears
    req = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        )
    )
    data = req.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(data)
    assert back.HasField("implicitGroupingKeyRequest")
    assert not back.HasField("statefulProcessorCall")


def test_descriptor_annotations_applied(sm):
    # the generated module sets _serialized_start/_end on _UPPER descriptors
    assert sm._STATEREQUEST._serialized_start > 0
    assert sm._HANDLESTATE._serialized_end > sm._HANDLESTATE._serialized_start


# ---------------------------------------------------------------------------
# Property fuzz: wire roundtrips over the full StateMessage schema
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:
    _INT64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    _INT32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
    _BYTES = st.binary(max_size=64)
    _TEXT = st.text(max_size=64)

    @settings(max_examples=200, deadline=None)
    @given(status=_INT32, err=_TEXT, value=st.lists(_BYTES, max_size=8),
           more=st.booleans())
    def test_fuzz_list_get_roundtrip(sm, status, err, value, more):
        msg = sm.StateResponseWithListGet(
            statusCode=status, errorMessage=err, value=value,
            requireNextFetch=more,
        )
        back = sm.StateResponseWithListGet()
        back.ParseFromString(msg.SerializeToString())
        assert back.statusCode == status
        assert back.errorMessage == err
        assert list(back.value) == value
        assert back.requireNextFetch == more

    @settings(max_examples=200, deadline=None)
    @given(ts=st.lists(_INT64, max_size=6), keys=st.lists(_BYTES, max_size=6))
    def test_fuzz_timer_roundtrip(sm, ts, keys):
        timers = [sm.TimerInfo(timestampMs=t) for t in ts] + [
            sm.TimerInfo(key=k, timestampMs=0) for k in keys
        ]
        msg = sm.StateResponseWithTimer(statusCode=1, timer=timers)
        back = sm.StateResponseWithTimer()
        back.ParseFromString(msg.SerializeToString())
        assert [x.timestampMs for x in back.timer[: len(ts)]] == ts
        assert [x.key for x in back.timer[len(ts):]] == keys

    @settings(max_examples=200, deadline=None)
    @given(name=_TEXT, schema=_TEXT, ttl=st.one_of(st.none(),
           st.integers(min_value=0, max_value=2**62)))
    def test_fuzz_state_call_roundtrip(sm, name, schema, ttl):
        cmd = sm.StateCallCommand()
        cmd.stateName = name
        cmd.schema = schema
        if ttl is not None:
            cmd.ttl.durationMs = ttl
        req = sm.StateRequest(
            statefulProcessorCall=sm.StatefulProcessorCall(getListState=cmd)
        )
        back = sm.StateRequest()
        back.ParseFromString(req.SerializeToString())
        got = back.statefulProcessorCall.getListState
        assert got.stateName == name
        assert got.schema == schema
        if ttl is not None:
            assert got.ttl.durationMs == ttl


# ---------------------------------------------------------------------------
# Wire-level regression tests (round-8 ADVICE items): zigzag sign handling,
# packed sint/bool decode, and presence-on-read of nested messages. These
# exercise shim internals directly — StateMessage declares no sint fields,
# so only a synthetic descriptor can reach those paths.
# ---------------------------------------------------------------------------


def _wire():
    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError:
        sys.path.append(_SHIM)
    import google.protobuf as gp

    if "protoshim" not in getattr(gp, "__file__", ""):
        pytest.skip("real protobuf installed; shim internals not in use")
    from google.protobuf import _wire as wire

    return wire


def _sint_message_cls(wire, repeated=False):
    desc = wire.Descriptor(
        "Synth",
        "synth.Synth",
        [
            wire.FieldDescriptor("s64", 1, wire.TYPE_SINT64, repeated, ""),
            wire.FieldDescriptor("s32", 2, wire.TYPE_SINT32, repeated, ""),
            wire.FieldDescriptor("flag", 3, wire.TYPE_BOOL, repeated, ""),
        ],
    )
    return type("Synth", (wire.ShimMessage,), {"DESCRIPTOR": desc})


def test_negative_sint_roundtrip():
    wire = _wire()
    cls = _sint_message_cls(wire)
    for v in (-1, -2, -987654321, -(2**62), 2**62, 0, 1):
        m = cls(s64=v, s32=max(-(2**31), min(2**31 - 1, v)))
        back = cls()
        back.ParseFromString(m.SerializeToString())
        assert back.s64 == v
        assert back.s32 == max(-(2**31), min(2**31 - 1, v))
    # zigzag keeps small negatives small on the wire (the spec's point)
    assert len(cls(s64=-1).SerializeToString()) == 2


def test_zigzag_encode_masks_before_xor():
    wire = _wire()
    # the old precedence bug made this negative → encode_varint hung
    for v in (-1, -5, -(2**63)):
        enc = wire._zigzag_encode(v)
        assert enc >= 0
        assert wire._zigzag_decode(enc) == v


def test_packed_sint_and_bool_decode():
    wire = _wire()
    cls = _sint_message_cls(wire, repeated=True)
    vals = [-3, -1, 0, 1, 7, -(2**40)]
    payload = b"".join(wire.encode_varint(wire._zigzag_encode(v)) for v in vals)
    flags_payload = b"".join(wire.encode_varint(int(b)) for b in (True, False, True))
    buf = (
        wire._tag(1, 2) + wire.encode_varint(len(payload)) + payload
        + wire._tag(3, 2) + wire.encode_varint(len(flags_payload)) + flags_payload
    )
    m = cls()
    m.ParseFromString(buf)
    assert list(m.s64) == vals
    assert list(m.flag) == [True, False, True]
    assert all(isinstance(b, bool) for b in m.flag)


def test_reading_nested_message_does_not_set_presence(sm):
    req = sm.StateCallCommand()
    # a bare READ of an unset nested message must not flip HasField or
    # change the serialized form (the JVM's hasTtl() would see a phantom)
    _ = req.ttl
    _ = req.ttl.durationMs
    assert not req.HasField("ttl")
    assert req.SerializeToString() == b""
    # ...but the generated-code nested-WRITE pattern still attaches,
    # including through a cached transient read handle
    handle = req.ttl
    handle.durationMs = 5
    assert req.HasField("ttl")
    assert req.ttl.durationMs == 5
    back = sm.StateCallCommand()
    back.ParseFromString(req.SerializeToString())
    assert back.ttl.durationMs == 5


def test_transient_child_parse_attaches(sm):
    req = sm.StateCallCommand()
    src = sm.TTLConfig(durationMs=99)
    req.ttl.ParseFromString(src.SerializeToString())
    assert req.HasField("ttl")
    assert req.ttl.durationMs == 99
