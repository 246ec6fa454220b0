"""Template-based NetFlow v9 / IPFIX decode (RFC 3954 / RFC 7011).

The reference's nfdump world is mostly v9/IPFIX: records carry no fixed
layout — each exporter first sends TEMPLATE records (field-type/length
lists), then data FlowSets that only a cached template can interpret.
This module provides:

- ``write_netflow_v9`` / ``write_ipfix``: deterministic export streams
  (two templates with DIFFERENT field orders; later packets rely on
  templates cached from earlier packets — the property that makes the
  decode stateful);
- ``decode_flow_stream``: a pure-Python streaming decoder keeping a
  per-(source, template-id) cache while walking one capture file. It is
  the shared decode body for both the ``binaryFile``+``mapInPandas``
  operator and the Python DataSource partition reader
  (``flows_netflow_v9_decode``) — one rotation file per partition, the
  exact sharding of the real nfcapd directory layout.

Wire formats follow the published specs only (Cisco v9 export format /
RFC 3954 field types; IPFIX per RFC 7011 with enterprise-bit skip).
Field types decoded: 1 IN_BYTES, 2 IN_PKTS, 4 PROTOCOL, 7 L4_SRC_PORT,
8 IPV4_SRC_ADDR, 11 L4_DST_PORT, 12 IPV4_DST_ADDR; every other type is
skipped BY TEMPLATE LENGTH — the template-driven skip is the whole
point of the format.
"""

from __future__ import annotations

import os
import struct

_V9_HEADER = ">HHIIII"  # version, count, sysUptime, unixSecs, seq, sourceId
_IPFIX_HEADER = ">HHIII"  # version, length, exportTime, seq, obsDomainId

# canonical output slots per decoded flow
FLOW_COLUMNS = ["sa", "da", "sp", "dp", "pr", "ipkt", "ibyt"]

# RFC 3954 §8 field types → (slot, formatter)
_FIELD_SLOT = {
    8: "sa",
    12: "da",
    7: "sp",
    11: "dp",
    4: "pr",
    2: "ipkt",
    1: "ibyt",
}


def _ip(v: int) -> str:
    return f"{v >> 24}.{(v >> 16) & 255}.{(v >> 8) & 255}.{v & 255}"


def _uint(buf: bytes) -> int:
    return int.from_bytes(buf, "big")


def _parse_templates(payload: bytes, ipfix: bool) -> list[tuple[int, list]]:
    """Template (flow)set payload → [(template_id, [(type, len), ...])]."""
    out = []
    off = 0
    while off + 4 <= len(payload):
        tid, n_fields = struct.unpack_from(">HH", payload, off)
        off += 4
        if tid == 0 or n_fields == 0:  # padding reached
            break
        fields = []
        for _ in range(n_fields):
            ftype, flen = struct.unpack_from(">HH", payload, off)
            off += 4
            if ipfix and ftype & 0x8000:  # enterprise bit: skip PEN
                off += 4
                ftype &= 0x7FFF
            fields.append((ftype, flen))
        out.append((tid, fields))
    return out


def _parse_data(payload: bytes, fields: list) -> list[dict]:
    rec_len = sum(flen for _, flen in fields)
    out = []
    off = 0
    while off + rec_len <= len(payload):  # tail < rec_len is padding
        rec: dict = {}
        for ftype, flen in fields:
            slot = _FIELD_SLOT.get(ftype)
            if slot is not None:
                v = _uint(payload[off : off + flen])
                rec[slot] = _ip(v) if slot in ("sa", "da") else v
            off += flen
        out.append(rec)
    return out


def _parse_options_templates(payload: bytes) -> list[tuple[int, list, list]]:
    """v9 options-template flowset payload (RFC 3954 §6.1) →
    [(template_id, scope_fields, option_fields)]. Lengths in the header
    are BYTE lengths of each section (4 bytes per field entry)."""
    out = []
    off = 0
    while off + 6 <= len(payload):
        tid, scope_len, opt_len = struct.unpack_from(">HHH", payload, off)
        off += 6
        if tid == 0:
            break
        scope, opts = [], []
        for _ in range(scope_len // 4):
            t, l = struct.unpack_from(">HH", payload, off)
            off += 4
            scope.append((t, l))
        for _ in range(opt_len // 4):
            t, l = struct.unpack_from(">HH", payload, off)
            off += 4
            opts.append((t, l))
        out.append((tid, scope, opts))
    return out


# RFC 3954 option field types: 34 SAMPLING_INTERVAL, 35 SAMPLING_ALGORITHM
_OPT_SAMPLING_INTERVAL = 34


def decode_flow_stream(
    content: bytes, with_meta: bool = False
) -> list[tuple] | tuple[list[tuple], dict]:
    """Decode one capture file of concatenated v9/IPFIX export packets.

    Returns ``[(sa, da, sp, dp, pr, ipkt, ibyt), ...]`` in wire order
    (with ``with_meta=True``: ``(flows, meta)`` where meta carries the
    per-source exporter metadata learned from v9 OPTIONS records —
    currently ``{"sampling": {source_id: interval}}``). Templates AND
    options templates are cached per (source/domain id, template id)
    for the lifetime of the stream, so data FlowSets in later packets
    decode against templates announced earlier — the stateful property
    fixed v5 never needed.
    """
    templates: dict[tuple[int, int], list] = {}
    opt_templates: dict[tuple[int, int], tuple[list, list]] = {}
    sampling: dict[int, int] = {}
    flows: list[tuple] = []
    off = 0
    n = len(content)
    while off + 4 <= n:
        version = struct.unpack_from(">H", content, off)[0]
        if version == 9:
            if off + 20 > n:
                break
            _, count, _, _, _, source_id = struct.unpack_from(
                _V9_HEADER, content, off
            )
            off += 20
            seen = 0
            while seen < count and off + 4 <= n:
                fsid, flen = struct.unpack_from(">HH", content, off)
                if flen < 4:
                    break
                payload = content[off + 4 : off + flen]
                off += flen
                if fsid == 0:  # template flowset
                    for tid, fields in _parse_templates(payload, ipfix=False):
                        templates[(source_id, tid)] = fields
                        seen += 1
                elif fsid == 1:  # options templates (scope + option fields)
                    for tid, scope, opts in _parse_options_templates(payload):
                        opt_templates[(source_id, tid)] = (scope, opts)
                        seen += 1
                elif fsid > 255 and (source_id, fsid) in opt_templates:
                    scope, opts = opt_templates[(source_id, fsid)]
                    rec_len = sum(l for _, l in scope) + sum(l for _, l in opts)
                    p = 0
                    while p + rec_len <= len(payload):
                        q = p + sum(l for _, l in scope)  # skip scope values
                        for t, l in opts:
                            if t == _OPT_SAMPLING_INTERVAL:
                                sampling[source_id] = _uint(
                                    payload[q : q + l]
                                )
                            q += l
                        p += rec_len
                        seen += 1
                elif fsid > 255:
                    fields = templates.get((source_id, fsid))
                    if fields is None:
                        continue  # data before its template: undecodable
                    recs = _parse_data(payload, fields)
                    seen += len(recs)
                    flows.extend(
                        tuple(r.get(c, 0) for c in FLOW_COLUMNS) for r in recs
                    )
        elif version == 10:
            if off + 16 > n:
                break
            _, length, _, _, domain = struct.unpack_from(
                _IPFIX_HEADER, content, off
            )
            end = off + length
            off += 16
            while off + 4 <= min(end, n):
                sid, slen = struct.unpack_from(">HH", content, off)
                if slen < 4:
                    break
                payload = content[off + 4 : off + slen]
                off += slen
                if sid == 2:  # template set
                    for tid, fields in _parse_templates(payload, ipfix=True):
                        templates[(domain, tid)] = fields
                elif sid == 3:  # options template set: skip
                    pass
                elif sid > 255:
                    fields = templates.get((domain, sid))
                    if fields is None:
                        continue
                    flows.extend(
                        tuple(r.get(c, 0) for c in FLOW_COLUMNS)
                        for r in _parse_data(payload, fields)
                    )
            off = end
        else:
            break
    if with_meta:
        return flows, {"sampling": sampling}
    return flows


# --- deterministic generators (the test ground truth) ------------------------

# template 256: the 'natural' order; 257 permutes fields AND pads with an
# undecoded type (21 LAST_SWITCHED) to prove template-driven skip
_T256 = [(8, 4), (12, 4), (7, 2), (11, 2), (4, 1), (2, 4), (1, 4)]
_T257 = [(1, 4), (21, 4), (2, 4), (4, 1), (8, 4), (12, 4), (11, 2), (7, 2)]


def _flow_values(f: int, r: int) -> dict:
    pkts = 1 + (r * 5 + f) % 90
    return {
        "sa": (10 << 24) | (f << 16) | (r % 250),
        "da": (172 << 24) | (16 << 16) | (f << 8) | (r % 250),
        "sp": 1024 + r,
        "dp": 53 if r % 3 else 443,
        "pr": 17 if r % 3 else 6,
        "ipkt": pkts,
        "ibyt": pkts * (40 + (r * 11) % 1200),
    }


def _expected_tuple(f: int, r: int) -> tuple:
    v = _flow_values(f, r)
    return (_ip(v["sa"]), _ip(v["da"]), v["sp"], v["dp"], v["pr"], v["ipkt"], v["ibyt"])


def _pack_record(fields: list, v: dict) -> bytes:
    out = b""
    for ftype, flen in fields:
        slot = _FIELD_SLOT.get(ftype)
        val = v[slot] if slot is not None else 0
        out += int(val).to_bytes(flen, "big")
    return out


def _template_flowset(fsid: int, tid: int, fields: list) -> bytes:
    body = struct.pack(">HH", tid, len(fields)) + b"".join(
        struct.pack(">HH", t, l) for t, l in fields
    )
    return struct.pack(">HH", fsid, 4 + len(body)) + body


def _data_flowset(tid: int, recs: list[bytes]) -> bytes:
    body = b"".join(recs)
    pad = (-len(body)) % 4  # 32-bit alignment padding per RFC 3954
    return struct.pack(">HH", tid, 4 + len(body) + pad) + body + b"\x00" * pad


def _options_flowsets(tid: int, interval: int) -> tuple[bytes, bytes, int]:
    """(options template flowset, options data flowset, n_records): one
    scope field (0x0001 System, 4 bytes) + SAMPLING_INTERVAL(34, 4) +
    SAMPLING_ALGORITHM(35, 1); data flowset padded to 32 bits."""
    scope, opts = [(1, 4)], [(34, 4), (35, 1)]
    body = struct.pack(">HHH", tid, 4 * len(scope), 4 * len(opts))
    for t, l in scope + opts:
        body += struct.pack(">HH", t, l)
    tmpl = struct.pack(">HH", 1, 4 + len(body)) + body
    rec = (0).to_bytes(4, "big") + interval.to_bytes(4, "big") + (1).to_bytes(1, "big")
    pad = (-len(rec)) % 4
    data = struct.pack(">HH", tid, 4 + len(rec) + pad) + rec + b"\x00" * pad
    return tmpl, data, 2  # template record + 1 data record


def write_netflow_v9(
    path: str,
    n_files: int = 4,
    records_per_file: int = 30,
    sampling_interval: int = 0,
) -> list[tuple]:
    """Write deterministic v9 capture files; returns the expected decoded
    flow tuples (the roundtrip ground truth).

    Each file = packet 1 (templates 256+257 announced, data for 256)
    followed by packet 2 (data for BOTH templates, templates NOT resent
    — decoding packet 2's 257-records requires the cache from packet 1).
    ``sampling_interval`` > 0 additionally announces an OPTIONS template
    (id 1024) in packet 1 and sends one options data record carrying
    SAMPLING_INTERVAL — the exporter metadata path.
    """
    os.makedirs(path, exist_ok=True)
    expected: list[tuple] = []
    for f in range(n_files):
        half = records_per_file // 2
        a_end = min(half + 5, records_per_file)  # packet-2 T256 slice
        recs1 = [_pack_record(_T256, _flow_values(f, r)) for r in range(half)]
        recs2a = [
            _pack_record(_T256, _flow_values(f, r)) for r in range(half, a_end)
        ]
        recs2b = [
            _pack_record(_T257, _flow_values(f, r))
            for r in range(a_end, records_per_file)
        ]
        expected.extend(_expected_tuple(f, r) for r in range(records_per_file))
        p1_sets = (
            _template_flowset(0, 256, _T256)
            + _template_flowset(0, 257, _T257)
            + _data_flowset(256, recs1)
        )
        n_opt = 0
        if sampling_interval:
            otmpl, odata, n_opt = _options_flowsets(1024, sampling_interval)
            p1_sets += otmpl + odata
        p1 = struct.pack(
            _V9_HEADER,
            9,
            2 + len(recs1) + n_opt,
            60_000 * f,
            1_709_251_200 + 300 * f,
            f,
            7,
        ) + p1_sets
        p2_sets = _data_flowset(256, recs2a) + _data_flowset(257, recs2b)
        p2 = struct.pack(
            _V9_HEADER,
            9,
            len(recs2a) + len(recs2b),
            60_000 * f + 1000,
            1_709_251_200 + 300 * f + 60,
            f + 1,
            7,
        ) + p2_sets
        with open(os.path.join(path, f"nfcapd.v9.{f:04d}"), "wb") as fh:
            fh.write(p1 + p2)
    return expected


def write_ipfix(path: str, n_files: int = 2, records_per_file: int = 20) -> list[tuple]:
    """Write deterministic IPFIX (v10) files; returns expected tuples.
    Template 256 is announced with an ENTERPRISE-numbered padding field
    (bit 15 set + 4-byte PEN) to exercise the RFC 7011 skip path."""
    os.makedirs(path, exist_ok=True)
    t256_wire = [(8, 4), (12, 4), (0x8000 | 210, 2), (7, 2), (11, 2), (4, 1), (2, 4), (1, 4)]
    t256_logical = [(8, 4), (12, 4), (210, 2), (7, 2), (11, 2), (4, 1), (2, 4), (1, 4)]
    expected: list[tuple] = []
    for f in range(n_files):
        recs = [_pack_record(t256_logical, _flow_values(100 + f, r)) for r in range(records_per_file)]
        expected.extend(_expected_tuple(100 + f, r) for r in range(records_per_file))
        tmpl_body = struct.pack(">HH", 256, len(t256_wire))
        for t, l in t256_wire:
            tmpl_body += struct.pack(">HH", t, l)
            if t & 0x8000:
                tmpl_body += struct.pack(">I", 12345)  # private enterprise number
        tmpl_set = struct.pack(">HH", 2, 4 + len(tmpl_body)) + tmpl_body
        data_body = b"".join(recs)
        pad = (-len(data_body)) % 4
        data_set = struct.pack(">HH", 256, 4 + len(data_body) + pad) + data_body + b"\x00" * pad
        msg_len = 16 + len(tmpl_set) + len(data_set)
        pkt = (
            struct.pack(_IPFIX_HEADER, 10, msg_len, 1_709_251_200 + 300 * f, f, 9)
            + tmpl_set
            + data_set
        )
        with open(os.path.join(path, f"nfcapd.ipfix.{f:04d}"), "wb") as fh:
            fh.write(pkt)
    return expected
