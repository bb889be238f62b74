#!/usr/bin/env python3
"""Generate offline oracle parquets for the B3 Price Report XML reader.

Replicates the reference's PricRpt extraction algorithm with stdlib
ElementTree (descendant tag walk, last-occurrence-wins, TradDt from the
Dt child of a TradDt element, rows require ticker+date), over the SPRD
fixtures in /root/reference/tests/b3/data. Output goes to
src/test/resources/boletim_oracle/<name>.parquet for SourcesSpec.
"""
import io
import sys
import zipfile
import xml.etree.ElementTree as ET
from pathlib import Path

import pandas as pd

TAGS = ["TradDt", "TckrSymb", "Id", "Prtry", "MktIdrCd", "DaysToSttlm",
        "TradQty", "MktDataStrmId", "NtlFinVol", "IntlFinVol", "OpnIntrst",
        "FinInstrmQty", "BestBidPric", "BestAskPric", "FrstPric", "MinPric",
        "MaxPric", "TradAvrgPric", "LastPric", "RglrTxsQty", "NonRglrTxsQty",
        "RglrTraddCtrcts", "NonRglrTraddCtrcts", "NtlRglrVol",
        "NtlNonRglrVol", "IntlRglrVol", "IntlNonRglrVol", "AdjstdQt",
        "AdjstdQtTax", "AdjstdQtStin", "PrvsAdjstdQt", "PrvsAdjstdQtTax",
        "PrvsAdjstdQtStin", "OscnPctg", "VartnPts", "EqvtVal",
        "AdjstdValCtrct", "MaxTradLmt", "MinTradLmt"]
TAGSET = set(TAGS)


def localname(tag):
    return tag[tag.find("}") + 1:] if tag.startswith("{") else tag


def extract_xml(data: bytes) -> bytes:
    if data[:2] != b"PK":
        return data
    z = zipfile.ZipFile(io.BytesIO(data))
    inner = z.read(z.namelist()[0])
    if inner[:2] == b"PK":
        zi = zipfile.ZipFile(io.BytesIO(inner))
        xmls = sorted(n for n in zi.namelist() if n.endswith(".xml"))
        return zi.read(xmls[-1])
    xmls = sorted(n for n in z.namelist() if n.endswith(".xml"))
    return z.read(xmls[-1])


def parse(xml_bytes: bytes):
    root = ET.fromstring(xml_bytes)
    records = []
    for pric in root.iter():
        if localname(pric.tag) != "PricRpt":
            continue
        dados, has_t, has_d = {}, False, False
        # build child->parent map within this PricRpt
        parent = {c: p for p in pric.iter() for c in p}
        for elem in pric.iter():
            text = elem.text
            if not text or not text.strip():
                continue
            tag = localname(elem.tag)
            if tag == "TckrSymb":
                dados["TckrSymb"] = text
                has_t = True
                continue
            if tag == "Dt":
                pai = parent.get(elem)
                if pai is not None and localname(pai.tag) == "TradDt":
                    dados["TradDt"] = text
                    has_d = True
                continue
            if tag in TAGSET:
                dados[tag] = text
        if has_t and has_d:
            records.append([dados.get(t) for t in TAGS])
    return records


def main():
    out_dir = Path("src/test/resources/boletim_oracle")
    out_dir.mkdir(parents=True, exist_ok=True)
    for zip_path in sorted(Path("/root/reference/tests/b3/data").glob("SPRD*.zip")):
        records = parse(extract_xml(zip_path.read_bytes()))
        df = pd.DataFrame(records, columns=TAGS).sort_values("TckrSymb")
        df.to_parquet(out_dir / f"{zip_path.stem}.parquet", index=False)
        print(zip_path.stem, len(df), "rows")


if __name__ == "__main__":
    main()
