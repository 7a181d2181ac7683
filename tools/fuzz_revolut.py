#!/usr/bin/env python3
"""Seeded differential fuzzer for the HARDCODED Revolut pipelines (round-12
verdict item 1): the dynamic-mapping fuzzer (fuzz_golden.py) covers the
declarative engine; this one covers revolut_stocks.py / revolut_crypto.py —
previously golden-tested only on declared fixtures.

Each case generates a pseudo-random Revolut export CSV drawn from pools of
the code paths the transformers actually branch on:
  - type strings: exact TYPE_MAP keys, SKIP_TYPES, BUY/SELL-prefix
    fallbacks ("BUY - STOP", "BUYBACK"), case/whitespace variants, unmapped
  - tickers/symbols: SYMBOL_MAP hits (4P41), suffix-guard edges (already-
    suffixed .L, GBX pence), lowercase passthrough, empty (row dropped)
  - currencies: suffix map keys, unknown, lowercase, empty (stocks default)
  - money: "USD 3.71"-prefixed, €$£-prefixed, comma-grouped, negative
    (crypto abs), junk, empty
  - dates: every H4 strptime format plus near-misses (unpadded fields —
    strptime accepts them; out-of-range dates; 7-digit fractions; wrong-
    pipeline formats; case-variant month names/AM-PM — strptime is
    case-insensitive)

then runs the EXECUTED reference ETLPipeline (extractor → transformer →
GhostfolioCsvLoader) and records loaded_count + output bytes as goldens
under src/test/resources/golden/fuzz_revolut/:

  rs_case_NNN.csv / .out.csv / .result.json     stocks family
  rc_case_NNN.csv / .out.csv / .result.json     crypto family
  cases_stocks.json / cases_crypto.json         index files

RevolutFuzzParitySpec replays every case through Revolut.stocksPlan /
cryptoPlan + writeGhostfolio and must match bytes and count. Determinism:
case i derives from random.Random(SEED + i); regenerating reproduces the
corpus byte-identically.

Run: python3 tools/fuzz_revolut.py [N_stocks] [N_crypto]   (defaults 70 70)
"""
import csv
import io
import json
import random
import sys
from pathlib import Path

sys.path.insert(0, "/root/reference/src")
from converter.extractors import RevolutStocksExtractor, RevolutCryptoExtractor  # noqa: E402
from converter.transformers import RevolutStocksTransformer, RevolutCryptoTransformer  # noqa: E402
from converter.loaders import GhostfolioCsvLoader  # noqa: E402
from converter.pipeline import ETLPipeline  # noqa: E402

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "src/test/resources/golden/fuzz_revolut"
OUT.mkdir(parents=True, exist_ok=True)

SEED_STOCKS = 91000
SEED_CRYPTO = 92000

STOCK_TYPES = [
    "BUY - MARKET", "BUY - LIMIT", "SELL - MARKET", "SELL - LIMIT",
    "DIVIDEND", "CASH TOP-UP", "CASH WITHDRAWAL", "CUSTODY FEE",
    "STOCK SPLIT", "BUY - STOP", "SELL - STOP", "BUYBACK", "SELLOFF",
    "buy - market", "Sell - Limit", "Dividend", "dividend", "TRANSFER",
    "", "BUY", "SELL", " BUY - MARKET ", "\tSELL - MARKET", "BU Y",
]

STOCK_TICKERS = [
    "AAPL", "TSLA", "4P41", "VUSA.L", "VUSA", "BMW", "", "msft",
    "SGLN.L", "ABC.DE", "P911.DE", " NVDA ", "4p41",
]

STOCK_CURRENCIES = ["USD", "EUR", "GBP", "GBX", "CHF", "", "usd", "  ", "SEK"]

STOCK_DATES = [
    "2024-01-15T10:30:00.123456Z", "2024-01-15T10:30:00Z",
    "2024-01-15T10:30:00", "2024-03-05", "15/03/2024", "03/15/2024",
    "2024-1-5", "2024-01-15T9:5:7Z", "2024-02-30", "31/04/2024",
    "Feb 3, 2020, 9:18:39 AM", "bad-date", "", "2024-01-15T10:30:00.1Z",
    "2024-01-15T10:30:00.1234567Z", "5/3/2024", "2024-12-31",
]

QUANTITIES = [
    "", "1", "2.5", "0.00116742", "835,721.7759", "1,5", "bogus", "-2",
    "10.123456789", "0", "3.50", "1e3", " 7 ",
]

STOCK_PRICES = [
    "USD 3.71", "EUR 1,234.56", "GBP 12.5", "CHF 9.99", "3.71", "1,000",
    "", "USD bogus", "GBX 55", " USD 2.5", "USD  3.71", "-4.25", "USD",
]

CRYPTO_TYPES = [
    "BUY", "SELL", "Buy", "sell", "PAYMENT", "STAKE", "UNSTAKE", "SEND",
    "RECEIVE", "EXCHANGE", "", "REWARD", " BUY ", "\tSELL", "BUYING",
]

CRYPTO_SYMBOLS = [
    "BTC", "ETH", "DOGE", "btc", "PEPE", "FOO", "XCN", "", "wEth",
    "SOL", " ada ", "XYZ123",
]

CRYPTO_MONEY = [
    "€8,565.88", "$100.00", "£12.50", "8,565.88", "-€5.00", "€-5.00",
    "$0.001", "", "bogus", "€ 1.5", " $2.5 ", "US$5", "£", "€0",
]

CRYPTO_DATES = [
    "Feb 3, 2020, 9:18:39 AM", "February 3, 2020, 9:18:39 AM",
    "feb 3, 2020, 9:18:39 am", "FEB 3, 2020, 9:18:39 PM",
    "2024-01-15T10:30:00.123Z", "2024-03-05", "Feb 3, 2020 9:18:39 AM",
    "Feb 3, 2020, 9:8:9 AM", "Xyz 3, 2020, 9:18:39 AM", "3 Feb 2020",
    "", "bad", "Feb 30, 2020, 9:18:39 AM", "15/03/2024",
]

STOCK_COLS = ["Date", "Ticker", "Type", "Quantity", "Price per share",
              "Total Amount", "Currency"]
CRYPTO_COLS = ["Symbol", "Type", "Quantity", "Price", "Value", "Fees", "Date"]


def gen_csv(rng, cols, pools, optional):
    """Random export: occasionally drop an optional column, shuffle column
    order, or append an unknown column; rows always full-width (DictReader
    short rows crash the reference extractor — not a pinnable behavior)."""
    cols = list(cols)
    if rng.random() < 0.20:
        drop = rng.choice(optional)
        cols.remove(drop)
    if rng.random() < 0.15:
        rng.shuffle(cols)
    if rng.random() < 0.10:
        cols.append("Junk")
    nrows = 0 if rng.random() < 0.05 else rng.randrange(4, 13)
    rows = [[rng.choice(pools.get(c, ["zz", "1", ""])) for c in cols]
            for _ in range(nrows)]
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    w.writerow(cols)
    w.writerows(rows)
    return buf.getvalue()


def run_family(prefix, n, seed, cols, pools, optional, pipeline):
    names = []
    for i in range(n):
        rng = random.Random(seed + i)
        name = f"{prefix}_case_{i:03d}"
        src = OUT / f"{name}.csv"
        src.write_text(gen_csv(rng, cols, pools, optional), encoding="utf-8")
        out = OUT / f"{name}.out.csv"
        count = pipeline.run(src, out)
        (OUT / f"{name}.result.json").write_text(
            json.dumps({"loaded_count": count}), encoding="utf-8")
        names.append(name)
    return names


def main():
    n_stocks = int(sys.argv[1]) if len(sys.argv) > 1 else 70
    n_crypto = int(sys.argv[2]) if len(sys.argv) > 2 else 70

    stock_pools = {
        "Date": STOCK_DATES, "Ticker": STOCK_TICKERS, "Type": STOCK_TYPES,
        "Quantity": QUANTITIES, "Price per share": STOCK_PRICES,
        "Total Amount": STOCK_PRICES, "Currency": STOCK_CURRENCIES,
    }
    crypto_pools = {
        "Symbol": CRYPTO_SYMBOLS, "Type": CRYPTO_TYPES,
        "Quantity": QUANTITIES, "Price": CRYPTO_MONEY,
        "Value": CRYPTO_MONEY, "Fees": CRYPTO_MONEY, "Date": CRYPTO_DATES,
    }
    stocks = run_family(
        "rs", n_stocks, SEED_STOCKS, STOCK_COLS, stock_pools,
        ["Currency", "Total Amount", "Quantity", "Price per share"],
        ETLPipeline(RevolutStocksExtractor(), RevolutStocksTransformer(),
                    GhostfolioCsvLoader()))
    crypto = run_family(
        "rc", n_crypto, SEED_CRYPTO, CRYPTO_COLS, crypto_pools,
        ["Fees", "Value", "Price", "Quantity"],
        ETLPipeline(RevolutCryptoExtractor(), RevolutCryptoTransformer(),
                    GhostfolioCsvLoader()))
    # micro-family: exotic whitespace Python str.strip() removes but Java's
    # \s does not (\x1c-\x1f, NEL, NBSP, unicode spaces) — round-13 review
    strip_pools = {
        "Date": ["\x1c2024-03-05", "2024-03-05\x85"],
        "Ticker": ["\x1dAAPL", "TSLA\xa0", " MSFT", "BMW\x1f"],
        "Type": ["\x1eBUY - MARKET", "SELL - MARKET\x85", "\xa0DIVIDEND"],
        "Quantity": ["\x1c2.5", "1 "],
        "Price per share": ["\x85USD 3.71", "4.25\xa0"],
        "Total Amount": ["1"], "Currency": ["\x1fUSD", "EUR ", ""],
    }
    strip = run_family(
        "rstrip", 10, 93000, STOCK_COLS, strip_pools, ["Currency"],
        ETLPipeline(RevolutStocksExtractor(), RevolutStocksTransformer(),
                    GhostfolioCsvLoader()))
    (OUT / "cases_strip.json").write_text(json.dumps(strip))
    (OUT / "cases_stocks.json").write_text(json.dumps(stocks))
    (OUT / "cases_crypto.json").write_text(json.dumps(crypto))
    total = sum(json.loads((OUT / f"{c}.result.json").read_text())["loaded_count"]
                for c in stocks + crypto)
    print(f"{n_stocks}+{n_crypto} cases; {total} total loaded activities")


if __name__ == "__main__":
    main()
