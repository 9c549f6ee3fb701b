"""Public-suffix snapshot for registrable-domain extraction.

A committed subset of the Mozilla Public Suffix List (publicsuffix.org —
public data, MPL-2.0) covering the common multi-label public suffixes:
ICANN country-code second-level registrations (``co.uk``, ``com.au``,
``co.jp``, ...) plus widely-used private-section platform suffixes
(``github.io``, ``blogspot.com``, ...).  Single-label TLDs need no listing:
any unlisted host falls back to the "last two labels" rule, which is the
correct PSL semantics for every plain TLD.

This is deliberately a *snapshot subset*, not a live fetch (no network in
the engine, and a dedup key must be frozen per corpus build anyway).  The
full list drops in by extending the tuples — the operator logic is
length-generic over 2- and 3-label suffixes.

Scale note: the snapshot ships to executors as literal ``InSet`` predicates
(constant-folded, whole-stage codegen) — no join, no broadcast table, no
Python UDF.  At the full ~10k-entry PSL a broadcast lookup table joined on
the candidate suffix would be the right shape; at snapshot size InSet is
strictly cheaper (hash-set probe per row).
"""

from __future__ import annotations

__all__ = ["PSL_2LABEL", "PSL_3LABEL"]

# ICANN section: ccTLD second-level registration points.
_ICANN_2LABEL = (
    # United Kingdom
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "sch.uk",
    # Japan
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    # Australia
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    # Brazil
    "com.br", "edu.br", "gov.br", "net.br", "org.br",
    # India
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "net.in", "nic.in", "org.in", "res.in",
    # New Zealand
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "kiwi.nz",
    "maori.nz", "net.nz", "org.nz", "school.nz",
    # China
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "net.cn", "org.cn",
    # Taiwan
    "com.tw", "edu.tw", "gov.tw", "idv.tw", "net.tw", "org.tw",
    # South Korea
    "ac.kr", "co.kr", "go.kr", "ne.kr", "or.kr", "re.kr",
    # South Africa
    "ac.za", "co.za", "gov.za", "net.za", "org.za", "web.za",
    # Mexico
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    # Argentina
    "com.ar", "edu.ar", "gob.ar", "net.ar", "org.ar",
    # Singapore
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg",
    # Malaysia
    "com.my", "edu.my", "gov.my", "net.my", "org.my",
    # Hong Kong
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    # Indonesia
    "ac.id", "co.id", "go.id", "net.id", "or.id", "sch.id", "web.id",
    # Turkey
    "com.tr", "edu.tr", "gov.tr", "net.tr", "org.tr",
    # Ukraine
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    # Israel
    "ac.il", "co.il", "gov.il", "muni.il", "net.il", "org.il",
    # Thailand
    "ac.th", "co.th", "go.th", "in.th", "net.th", "or.th",
    # Vietnam
    "com.vn", "edu.vn", "gov.vn", "net.vn", "org.vn",
    # Philippines
    "com.ph", "edu.ph", "gov.ph", "net.ph", "org.ph",
    # Egypt / Saudi Arabia / Pakistan / Bangladesh / Nigeria / Kenya
    "com.eg", "edu.eg", "gov.eg", "net.eg", "org.eg",
    "com.sa", "edu.sa", "gov.sa", "net.sa", "org.sa",
    "com.pk", "edu.pk", "gov.pk", "net.pk", "org.pk",
    "com.bd", "edu.bd", "gov.bd", "net.bd", "org.bd",
    "com.ng", "edu.ng", "gov.ng", "net.ng", "org.ng",
    "ac.ke", "co.ke", "go.ke", "ne.ke", "or.ke",
    # Latin America (rest)
    "com.co", "edu.co", "gov.co", "net.co", "org.co",
    "com.pe", "edu.pe", "gob.pe", "net.pe", "org.pe",
    "co.ve", "com.ve", "gob.ve", "net.ve", "org.ve",
    "com.uy", "edu.uy", "gub.uy", "net.uy", "org.uy",
    "com.ec", "edu.ec", "gob.ec", "net.ec", "org.ec",
    "ac.cr", "co.cr", "go.cr", "or.cr",
    "com.bo", "com.do", "com.gt", "com.hn", "com.ni", "com.pa",
    "com.py", "com.sv",
    # Russia (legacy second-level)
    "com.ru", "msk.ru", "net.ru", "org.ru", "spb.ru",
    # Poland
    "com.pl", "edu.pl", "gov.pl", "net.pl", "org.pl", "waw.pl",
)

# Private section: platform suffixes under which users register
# independent sites (each subdomain is its own "registrable domain").
_PRIVATE_2LABEL = (
    "github.io", "gitlab.io", "readthedocs.io", "ngrok.io",
    "blogspot.com", "wordpress.com", "firebaseapp.com",
    "herokuapp.com", "appspot.com", "cloudfront.net",
    "azurewebsites.net", "netlify.app", "web.app",
    "vercel.app", "pages.dev", "workers.dev", "fly.dev",
    "onrender.com", "surge.sh", "glitch.me", "repl.co",
)

PSL_2LABEL: tuple[str, ...] = tuple(sorted(_ICANN_2LABEL + _PRIVATE_2LABEL))

# 3-label suffixes (private section; the ICANN 3-label entries are mostly
# wildcarded regional trees — extend here when a corpus needs them).
PSL_3LABEL: tuple[str, ...] = (
    "s3.amazonaws.com",
)
