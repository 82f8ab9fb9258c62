"""Consent-email sink (SURVEY.md §2.2 K6).

The reference builds one consent-solicitation EmailMessage per person:
keep only @rki.de addresses, join them into the To: field, fill an
HTML template with the person's fields, subject from config
(consent_mailer/transform.py:15-61). The TRANSFORM is pure string
work — here it is codegen'd expressions over the persons DataFrame
(filter → array_join → template fill), so building 10^8 emails is one
scan. The SEND is a side-channel: ``write_outbox`` spools rendered
messages as one RFC-822-ish file per partition from the executors
(an SMTP relay fan-out drops in at the same point on a real cluster).
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FROM_ADDRESS = "Metadata Exchange <mex@rki.de>"
OUTBOX_SCHEMA = "file_name string, n_messages long, content_sha256 string"


def consent_emails(
    persons: DataFrame,
    emails_col: str = "emails",
    name_col: str = "name",
    domain: str = "@rki.de",
    subject: str = "Your consent is required",
    template: str = "Dear {name}, please confirm your consent to be listed.",
) -> DataFrame:
    """(to_field, subject, body) per person with ≥1 in-domain address;
    persons without one are dropped (the reference returns None for
    them). ``emails_col`` is an array<string> column."""
    keep: Column = F.filter(F.col(emails_col), lambda e: e.endswith(domain))
    body = F.lit(template.replace("{name}", "\x00"))
    return (
        persons.withColumn("_to", F.array_join(keep, "; "))
        .where(F.col("_to") != "")
        .select(
            F.col("_to").alias("to_field"),
            F.lit(subject).alias("subject"),
            F.replace(body, F.lit("\x00"), F.col(name_col)).alias("body"),
        )
    )


def write_outbox(emails: DataFrame, out_dir: str) -> DataFrame:
    """Spool rendered messages from the executors: one
    ``outbox-<partition>.eml`` file per input partition (messages
    separated by a blank line), manifest row per file. Swap the file
    write for an SMTP client to send for real; the partition is the
    connection-reuse unit."""
    os.makedirs(out_dir, exist_ok=True)

    def spool(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts: list[str] = []
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                parts.append(
                    f"From: {FROM_ADDRESS}\nTo: {row.to_field}\n"
                    f"Subject: {row.subject}\n\n{row.body}\n"
                )
        if not parts:
            return
        payload = "\n".join(parts).encode("utf-8")
        sha = hashlib.sha256(payload).hexdigest()
        file_name = f"outbox-{sha[:12]}.eml"
        with open(os.path.join(out_dir, file_name), "wb") as fh:
            fh.write(payload)
        yield pd.DataFrame(
            {
                "file_name": [file_name],
                "n_messages": [len(parts)],
                "content_sha256": [sha],
            }
        )

    return emails.mapInPandas(spool, OUTBOX_SCHEMA)
