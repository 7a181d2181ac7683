#!/usr/bin/env python3
"""Generate golden parity fixtures by executing the REFERENCE engine
(read-only at /root/reference) on synthetic inputs.

Outputs under src/test/resources/golden/:
  - <name>.out.csv        reference CSV output (when written)
  - <name>.result.json    counts + errors + written flag
  - pyfloat.json          str(float) goldens for PyFormat.pyFloatStr
  - money8.json           f"{v:.8f}" strip goldens for PyFormat.money8
"""
import csv, json, os, sys, io, tempfile
from pathlib import Path

sys.path.insert(0, "/root/reference/src")
from converter.transformers.dynamic import DynamicTransformer  # noqa: E402

ROOT = Path(__file__).resolve().parent.parent
FIX = ROOT / "src/test/resources/fixtures"
GOLD = ROOT / "src/test/resources/golden"
GOLD.mkdir(parents=True, exist_ok=True)
FIX.mkdir(parents=True, exist_ok=True)

MAPPINGS = json.load(open("/root/reference/data/config/mappings.json"))

# ---- fixture CSVs (from FIXTURES.md §A; synthesized, not copied) -----------
STOCKS = """Date,Ticker,Type,Quantity,Price per share,Total Amount,Currency
2024-01-15T10:30:00.123Z,AAPL,BUY - MARKET,10,USD 185.50,1855.00,USD
2024-01-16T09:00:00Z,4P41,BUY - LIMIT,2,"EUR 92,10",184.20,EUR
2024-02-01T14:05:10,VOD,SELL - MARKET,100,GBP 0.71,71.00,GBP
2024-02-02,AAPL,DIVIDEND,0,USD 0.24,2.40,USD
15/03/2024,TSLA,SELL - LIMIT,1,"1,234.56",1234.56,USD
2024-03-01T00:00:00,,BUY - MARKET,5,USD 10.00,50.00,USD
2024-03-02T00:00:00,MSFT,DEPOSIT,,,,USD
2024-03-03T00:00:00,MSFT,CUSTODY FEE,,USD 1.00,1.00,USD
not-a-date,NVDA,BUY - STOP,3,bogus,x,
"""
CRYPTO = """Symbol,Type,Quantity,Price,Value,Fees,Date
BTC,Buy,0.00116742,"€8,565.88",€10.00,€0.10,"Feb 3, 2020, 9:18:39 AM"
ETH,Sell,1.5,$2000.00,$3000.00,$1.50,"Mar 15, 2024, 11:59:59 PM"
DOGE,Buy,"835,721.7759",£0.05,£41786.09,£5,2024-01-01T10:00:00.000Z
NEWCOIN,Buy,1,€1.00,€1.00,€0.01,"Jan 2, 2024, 1:00:00 PM"
BTC,Transfer,0.1,,,,"Jan 3, 2024, 1:00:00 PM"
SOL,STAKE,2,€20,€40,,"Jan 4, 2024, 1:00:00 PM"
"""
# broad per-transform/filter exercise over a generic table
KITCHEN = """name,qty,price,status,date,code,note
alpha,2,10.5,active,2024-01-15T10:30:00Z,A,has spark inside
beta,,20,inactive,2024-02-20 08:00:00,B,plain
gamma,3,bogus,active,,C,
delta,4,2.5,unknown,bad-date,D,x
epsilon,0,"1,5",active,2024-03-01T00:00:00.500Z,ZZ,y
_default,1,1,active,2024-04-01T00:00:00Z,A,z
"""
KITCHEN_MAPPING = {
    "id": "kitchen", "name": "Kitchen Sink", "source_id": "k", "destination_id": "k2",
    "field_mappings": [
        {"destination_field": "n", "source_field": "name", "transform_type": "direct", "transform_config": {}},
        {"destination_field": "c", "source_field": None, "transform_type": "constant", "transform_config": {"value": 0}},
        {"destination_field": "cs", "source_field": None, "transform_type": "constant", "transform_config": {"value": "fixed"}},
        {"destination_field": "d", "source_field": "date", "transform_type": "date_format",
         "transform_config": {"input_format": "%Y-%m-%dT%H:%M:%S", "output_format": "%d/%m/%Y"}},
        {"destination_field": "lk", "source_field": "code", "transform_type": "lookup",
         "transform_config": {"A": "Apple", "B": "Banana", "_default": None}},
        {"destination_field": "lkd", "source_field": "code", "transform_type": "lookup",
         "transform_config": {"A": "Apple", "_default": "Other"}},
        {"destination_field": "sfx", "source_field": "name", "transform_type": "suffix",
         "transform_config": {"value": "-X", "condition": "status == 'active'"}},
        {"destination_field": "pfx", "source_field": "name", "transform_type": "prefix",
         "transform_config": {"value": ">>"}},
        {"destination_field": "f", "source_field": "qty", "transform_type": "formula",
         "transform_config": {"expression": "qty * price"}},
        {"destination_field": "fbad", "source_field": "qty", "transform_type": "formula",
         "transform_config": {"expression": "qty * missing_col"}},
        {"destination_field": "cond", "source_field": "status", "transform_type": "conditional",
         "transform_config": {"conditions": [
             {"if": "status == 'active'", "then": "YES"},
             {"if": "status in ['inactive', 'paused']", "then": "NO"},
             {"else": "MAYBE"}]}},
        {"destination_field": "unk", "source_field": "note", "transform_type": "wat", "transform_config": {}},
        # duplicate destination: later overwrites value, first position kept
        {"destination_field": "n", "source_field": "code", "transform_type": "direct", "transform_config": {}},
    ],
    "filter_rules": [
        {"field": "name", "operator": "equals", "value": "delta"},
        {"field": "note", "operator": "contains", "value": "spark"},
    ],
}

FILTER_MAPPING = {
    "id": "filters", "name": "Filter exercise", "source_id": "k", "destination_id": "k2",
    "field_mappings": [
        {"destination_field": "n", "source_field": "name", "transform_type": "direct", "transform_config": {}},
    ],
    "filter_rules": [
        {"field": "status", "operator": "not_in", "values": ["active", "unknown"]},
        {"field": "qty", "operator": "is_empty"},
    ],
}


def run(name, csv_text, mapping, fail_on_error):
    src = FIX / f"{name}.csv"
    src.write_text(csv_text)
    (GOLD / f"{name}.mapping.json").write_text(json.dumps(mapping, indent=1))
    (GOLD / f"{name}.fail_on_error").write_text(str(fail_on_error))
    out = GOLD / f"{name}.out.csv"
    if out.exists():
        out.unlink()
    t = DynamicTransformer(mapping)
    r = t.transform_file(src, out, fail_on_error=fail_on_error)
    golden = {
        "success_count": r.success_count,
        "skipped_count": r.skipped_count,
        "error_count": r.error_count,
        "written": out.exists(),
        "errors": [
            {"line_number": e.line_number, "field": e.field,
             "source_value": e.source_value}
            for e in r.errors
        ],
    }
    (GOLD / f"{name}.result.json").write_text(json.dumps(golden, indent=1))
    print(name, golden["success_count"], golden["skipped_count"],
          golden["error_count"], "written=", golden["written"])


run("stocks_dynamic", STOCKS, MAPPINGS["revolut_stocks_to_ghostfolio"], False)
run("crypto_dynamic", CRYPTO, MAPPINGS["revolut_crypto_to_ghostfolio"], False)
run("kitchen", KITCHEN, KITCHEN_MAPPING, False)
run("kitchen_gate", KITCHEN, KITCHEN_MAPPING, True)
run("filters", KITCHEN, FILTER_MAPPING, False)

# embedded newline inside a quoted field: DictReader yields 3 records;
# line_number is the RECORD ordinal + 1 (enumerate(reader, start=2)),
# NOT the physical file line — gamma sits on physical line 5, reports 4.
MULTILINE = 'name,qty,d\nalpha,1,"li\nne"\nbeta,,x\ngamma,3,bad-date\n'
MULTILINE_MAPPING = {
    "id": "ml", "name": "ml", "source_id": "s", "destination_id": "d",
    "field_mappings": [
        {"destination_field": "n", "source_field": "name", "transform_type": "direct", "transform_config": {}},
        {"destination_field": "dd", "source_field": "d", "transform_type": "date_format",
         "transform_config": {"input_format": "%Y-%m-%d", "output_format": "%d/%m/%Y"}},
    ],
    "filter_rules": [{"field": "qty", "operator": "is_empty"}],
}
run("multiline", MULTILINE, MULTILINE_MAPPING, False)

# ---- hardcoded-pipeline goldens (EP1: cli.py path) -------------------------
from converter.pipeline import ETLPipeline  # noqa: E402
from converter.extractors.revolut_stocks import RevolutStocksExtractor  # noqa: E402
from converter.extractors.revolut_crypto import RevolutCryptoExtractor  # noqa: E402
from converter.transformers.revolut_stocks import RevolutStocksTransformer  # noqa: E402
from converter.transformers.revolut_crypto import RevolutCryptoTransformer  # noqa: E402
from converter.loaders.csv_loader import GhostfolioCsvLoader  # noqa: E402

# extra rows exercising H1 prefix-fallback, H3 endswith-guard/GBX, H8 default
STOCKS_HC = STOCKS + """BAD,XYZ.L,SELL - STOP LOSS,1,GBX 100,100,GBX
2024-04-01T00:00:00,SAP,BUY - SOMETHING,2,"EUR 1,000.50",2001.00,EUR
2024-04-02T00:00:00,FOO,INTEREST,1,USD 1.00,1.00,CHF
"""
CRYPTO_HC = CRYPTO + """pepe,buy,1000,,€5.00,€0.05,"Apr 1, 2024, 2:30:00 PM"
BTC,SELL,"0.5",$30000,$15000,$7.5,bogus-date
"""


def run_hardcoded(name, csv_text, extractor, transformer):
    src = FIX / f"{name}.csv"
    src.write_text(csv_text)
    out = GOLD / f"{name}.out.csv"
    if out.exists():
        out.unlink()
    n = ETLPipeline(extractor, transformer, GhostfolioCsvLoader()).run(src, out)
    (GOLD / f"{name}.result.json").write_text(json.dumps({"loaded_count": n}))
    print(name, "loaded", n)


run_hardcoded("stocks_hardcoded", STOCKS_HC,
              RevolutStocksExtractor(), RevolutStocksTransformer())
run_hardcoded("crypto_hardcoded", CRYPTO_HC,
              RevolutCryptoExtractor(), RevolutCryptoTransformer())

# ---- number formatting goldens ---------------------------------------------
vals = [0.0, -0.0, 1.0, -1.0, 0.5, 1.5, 123.0, 1855.0, 0.1, 0.00000001,
        1e-5, 1.23e-5, 9999999.0, 1e7, 12345678.9, 1e15, 1e16, 1.5e16,
        -2.5e-7, 3.14159265358979, 835721.7759, 41786.09, 2e300, 5e-324,
        123456789.123456, 0.30000000000000004]
json.dump({repr(v): str(v) for v in vals}, open(GOLD / "pyfloat.json", "w"), indent=1)
json.dump({repr(v): (f"{v:.8f}".rstrip("0").rstrip(".") or "0")
           for v in vals if abs(v) < 1e17},
          open(GOLD / "money8.json", "w"), indent=1)
print("goldens written to", GOLD)
