"""Generate the reference-faithful raw-ingest CSV fixture (FIXTURES.md §1).

Deterministic (seeded); written under a temp dir by tests.  Encodes every
mandatory edge case: empty arrays, ``status: None``, duplicate ``oid__id``
within and across files, descriptions with embedded tabs/apostrophes/accents,
and one 88-element event list.
"""

from __future__ import annotations

import csv
import os
import random

DESCRIPTIONS = [
    "Objeto postado",
    "Objeto em trânsito - por favor aguarde",
    "Objeto saiu para entrega ao destinatário",
    "A entrega não pode ser efetuada - endereço incorreto",
    "Objeto entregue ao\tdestinatário",  # embedded tab
    "Objeto aguardando retirada no endereço indicado - prazo d'entrega",  # apostrophe
    'Solicitação de "suspensão" da entrega',  # embedded double quotes
]


def _hex32(rng: random.Random) -> str:
    return "".join(rng.choice("0123456789abcdef") for _ in range(32))


def _event(rng: random.Random, ts_ms: int) -> dict:
    return {
        "createdAt": {"$date": ts_ms},
        "trackingCode": _hex32(rng),
        "status": rng.choice(["101", "23", "505", None]),
        "description": rng.choice(DESCRIPTIONS),
        "trackerType": _hex32(rng),
        "from": _hex32(rng),
        "to": _hex32(rng),
    }


def generate(out_dir: str, n_files: int = 6, rows_per_file: int = 60, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    base_epoch = 1_693_000_000  # 2023-08-25ish, matches reference era
    # pool of keys; ~12% reused across files, some within a file
    keys = [_hex32(rng) for _ in range(int(n_files * rows_per_file * 0.8))]
    files: list[str] = []
    for i in range(n_files):
        name = f"202309{i + 10:02d}-1300051{i:02d}.csv"
        files.append(name)
        path = os.path.join(out_dir, name)
        with open(path, "w", newline="", encoding="utf-8") as fh:
            w = csv.writer(fh)
            w.writerow(
                ["Op", "oid__id", "createdAt", "updatedAt", "lastSyncTracker",
                 "array_trackingEvents"]
            )
            for j in range(rows_per_file):
                # the 88-event row gets a dedicated key so keep-last dedup
                # can never replace it with a later redelivery
                oid = "f" * 32 if (i == 0 and j == 1) else rng.choice(keys)
                created = base_epoch + rng.randrange(0, 10_000_000)
                updated = created + rng.randrange(0, 1_000_000)
                if i == 0 and j == 0:
                    n_events = 0  # mandatory: empty array row
                elif i == 0 and j == 1:
                    n_events = 88  # mandatory: long event list
                else:
                    n_events = rng.randrange(0, 20)
                events = [
                    _event(rng, (created + k * 3600) * 1000)
                    for k in range(n_events)
                ]
                w.writerow(
                    [
                        "U" if rng.random() < 0.99 else "I",
                        oid,
                        created,
                        updated,
                        created + rng.randrange(0, 500_000),
                        repr(events),
                    ]
                )
            # mandatory: duplicate oid__id within this file
            w.writerow(
                ["U", keys[i], base_epoch + i, base_epoch + i + 10, base_epoch + i,
                 repr([_event(rng, (base_epoch + i) * 1000)])]
            )
            w.writerow(
                ["U", keys[i], base_epoch + i + 100, base_epoch + i + 110,
                 base_epoch + i, repr([_event(rng, (base_epoch + i + 100) * 1000)])]
            )
    return files
