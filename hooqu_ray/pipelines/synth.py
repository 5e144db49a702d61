"""Deterministic synthetic transcript generator.

Produces the flagship input table from ``BASELINE.json`` ``input_hint``::

    (conv_id: string, turn_idx: int32, role: string,
     text: string, tool: string, ts: timestamp[us])

Planted, countable defect quotas per quality rule (emails, credit cards,
URLs, high-symbol noise, repeated n-grams, non-English spans, gibberish,
toxic tokens, nulls) so keep/drop and scrub goldens are computable by an
independent single-process reference implementation.  Conversation lengths
are Zipf-skewed: a few conversations are very long, exercising the salting /
skew path at scale.

Everything is a pure function of (seed, n_convs): stable across runs,
processes and machines (numpy PCG64).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

ROLES = ("user", "assistant", "system", "tool")
TOOLS = ("search", "python", "browser", "calculator")

_EN_SENTENCES = (
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "We reviewed the quarterly report and found the numbers were consistent.",
    "Please summarize the document and highlight the three main findings.",
    "The model was trained on a large corpus of publicly available text.",
    "Thank you for the update, the deployment finished without any errors.",
    "Could you explain how the streaming executor schedules the work queue?",
    "Here is the function you asked for, with comments explaining each step.",
    "The weather station recorded unusually high temperatures this spring.",
    "Our team will meet on Thursday to discuss the new data pipeline design.",
    "I checked the logs and the job completed in about seven minutes.",
)

_DE_SENTENCES = (
    "Der schnelle braune Fuchs springt über den faulen Hund am Flussufer.",
    "Wir haben den Bericht geprüft und die Zahlen waren durchweg konsistent.",
    "Bitte fassen Sie das Dokument zusammen und nennen Sie die Ergebnisse.",
    "Das Modell wurde mit einem großen öffentlichen Textkorpus trainiert.",
    "Vielen Dank für die Rückmeldung, die Bereitstellung war fehlerfrei.",
)

_FR_SENTENCES = (
    "Le rapide renard brun saute par dessus le chien paresseux au bord de la rivière.",
    "Nous avons examiné le rapport trimestriel et les chiffres étaient cohérents.",
    "Veuillez résumer le document et souligner les trois conclusions principales.",
    "Le modèle a été entraîné sur un grand corpus de textes publics.",
    "Merci pour la mise à jour, le déploiement s'est terminé sans erreur.",
)

_TOXIC_WORDS = ("frakking", "dangblast", "scuzzbucket")  # synthetic stand-ins

_EMAILS = ("alice@example.org", "bob.smith@mail.example.com", "carol99@test.example.net")
_CCS = ("4111 1111 1111 1111", "5555-5555-5555-4444", "378282246310005")
_URLS = ("http://example.com/docs", "https://data.example.org/sets?id=42", "ftp://files.example.net/pub")


def _rng_for(seed: int) -> np.random.Generator:
    return np.random.default_rng(np.random.PCG64(seed))


def generate_transcripts(n_convs: int = 200, seed: int = 42) -> pa.Table:
    """~n_convs conversations, Zipf-ish turn counts (median ~8, max ~hundreds)."""
    rng = _rng_for(seed)
    conv_lengths = np.minimum((rng.pareto(1.2, n_convs) * 6 + 3).astype(np.int64), 400)

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    base_ts = np.datetime64("2025-01-01T00:00:00", "us")

    for ci in range(n_convs):
        conv = f"conv-{seed}-{ci:06d}"
        n_turns = int(conv_lengths[ci])
        t0 = base_ts + np.timedelta64(int(rng.integers(0, 10_000_000)), "s")
        for ti in range(n_turns):
            role = ROLES[ti % 2]  # strict user/assistant alternation baseline
            r = rng.random()
            tool = None
            if r < 0.05:
                role = "tool"
                tool = TOOLS[int(rng.integers(0, len(TOOLS)))]
            elif ti == 0 and rng.random() < 0.2:
                role = "system"
            texts.append(_make_text(rng))
            conv_ids.append(conv)
            turn_idxs.append(ti)
            roles.append(role)
            tools.append(tool)
            tss.append(t0 + np.timedelta64(ti * 30 + int(rng.integers(0, 10)), "s"))

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )


def _make_text(rng: np.random.Generator) -> str:
    """One turn's text; ~70% clean English, the rest planted defects."""
    r = rng.random()
    pick = lambda seq: seq[int(rng.integers(0, len(seq)))]  # noqa: E731
    n_sent = int(rng.integers(1, 4))
    base = " ".join(pick(_EN_SENTENCES) for _ in range(n_sent))
    if r < 0.02:
        return None  # null text
    if r < 0.04:
        return ""  # empty
    if r < 0.10:  # PII: email
        words = base.split()
        words.insert(int(rng.integers(0, len(words))), f"contact {pick(_EMAILS)} please")
        return " ".join(words)
    if r < 0.14:  # PII: credit card
        return base + f" my card number is {pick(_CCS)} thanks"
    if r < 0.18:  # URL
        return base + f" see {pick(_URLS)} for details"
    if r < 0.22:  # non-English span
        return " ".join(pick(_DE_SENTENCES if rng.random() < 0.5 else _FR_SENTENCES)
                        for _ in range(n_sent))
    if r < 0.25:  # high symbol ratio noise
        syms = "".join(pick("!@#$%^&*()[]{}<>~|\\/+=_-") for _ in range(int(rng.integers(30, 80))))
        return syms
    if r < 0.28:  # repeated n-grams
        phrase = pick(_EN_SENTENCES).split()[:3]
        return " ".join(" ".join(phrase) for _ in range(int(rng.integers(8, 20))))
    if r < 0.30:  # gibberish (no stopwords, long 'words')
        return " ".join(
            "".join(pick("bcdfghjklmnpqrstvwxz") for _ in range(int(rng.integers(8, 18))))
            for _ in range(int(rng.integers(5, 15)))
        )
    if r < 0.32:  # toxicity
        words = base.split()
        words.insert(int(rng.integers(0, len(words))), pick(_TOXIC_WORDS))
        return " ".join(words)
    if r < 0.34:  # too short
        return pick(("ok", "yes", "no", "thx", "k"))
    return base


def write_transcripts_parquet(path: str, n_convs: int = 200, seed: int = 42) -> str:
    import pyarrow.parquet as pq

    table = generate_transcripts(n_convs, seed)
    pq.write_table(table, path)
    return path
