"""Browser frontend for the ``/process`` endpoint.

Re-creates the reference UI's capabilities (reference index.html:1-543:
payload input, dynamic schema cards, result table, client-side CSV export
with RFC-style quoting — quoting rules at index.html:382-409) as our own
single-file page.  Written from scratch against OUR endpoint contract;
no markup or script is taken from the reference.

Served by :mod:`etl_pipeline2_0_spark.server` at ``/``; static, no
framework, no build step.
"""

from __future__ import annotations

INDEX_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>ETL Pipeline 2.0 — Spark engine</title>
<style>
  :root { --fg: #1a1a2e; --muted: #6b7280; --line: #d9dce3; --accent: #125d86; }
  body { font-family: system-ui, sans-serif; color: var(--fg); margin: 2rem auto;
         max-width: 64rem; padding: 0 1rem; }
  h1 { font-size: 1.4rem; } h2 { font-size: 1.1rem; margin-top: 1.6rem; }
  textarea { width: 100%; min-height: 9rem; font-family: ui-monospace, monospace;
             font-size: .85rem; border: 1px solid var(--line); border-radius: 6px;
             padding: .5rem; box-sizing: border-box; }
  button { background: var(--accent); color: #fff; border: 0; border-radius: 6px;
           padding: .45rem 1rem; font-size: .9rem; cursor: pointer; margin-right: .5rem; }
  button:disabled { opacity: .5; cursor: wait; }
  #cards { display: flex; flex-wrap: wrap; gap: .6rem; }
  .card { border: 1px solid var(--line); border-radius: 8px; padding: .5rem .8rem; }
  .card b { display: block; font-size: .85rem; }
  .card span { color: var(--muted); font-size: .75rem; }
  table { border-collapse: collapse; width: 100%; font-size: .8rem; margin-top: .6rem; }
  th, td { border: 1px solid var(--line); padding: .25rem .5rem; text-align: left;
           max-width: 18rem; overflow: hidden; text-overflow: ellipsis;
           white-space: nowrap; }
  th { background: #f3f4f6; position: sticky; top: 0; }
  #status { color: var(--muted); font-size: .85rem; margin: .5rem 0; }
  #error { color: #b00020; white-space: pre-wrap; }
</style>
</head>
<body>
<h1>ETL Pipeline 2.0 — Spark engine</h1>
<p>Paste raw text (HTML fragments, JSON lines, plain text, base64 payloads)
or pick a file, then process it. The table below reflects the dynamically
inferred schema of the extracted records.</p>

<textarea id="payload" placeholder='{"name": "Widget", "price": 9.99}&#10;plain text line...'></textarea>
<p>
  <button id="go">Process</button>
  <input type="file" id="file">
  <button id="csv" disabled>Download CSV</button>
</p>
<div id="status"></div>
<div id="error"></div>

<h2>Schema</h2>
<div id="cards"><span style="color:var(--muted)">no result yet</span></div>

<h2>Records</h2>
<div style="max-height: 28rem; overflow: auto"><table id="table"></table></div>

<script>
"use strict";
let lastResult = null;

document.getElementById("file").addEventListener("change", async (ev) => {
  const f = ev.target.files[0];
  if (f) document.getElementById("payload").value = await f.text();
});

document.getElementById("go").addEventListener("click", async () => {
  const btn = document.getElementById("go");
  const status = document.getElementById("status");
  const errBox = document.getElementById("error");
  errBox.textContent = "";
  const body = document.getElementById("payload").value;
  btn.disabled = true;
  status.textContent = "processing…";
  try {
    const resp = await fetch("/process", { method: "POST", body });
    const out = await resp.json();
    if (!resp.ok || !out.success) throw new Error(out.error || ("HTTP " + resp.status));
    lastResult = out;
    status.textContent = out.data.length + " records, " +
      Object.keys(out.types).length + " columns";
    renderCards(out.types);
    renderTable(out.data, Object.keys(out.types));
    document.getElementById("csv").disabled = out.data.length === 0;
  } catch (e) {
    status.textContent = "";
    errBox.textContent = String(e.message || e);
  } finally {
    btn.disabled = false;
  }
});

function renderCards(types) {
  const cards = document.getElementById("cards");
  cards.replaceChildren();
  for (const [col, ty] of Object.entries(types)) {
    const d = document.createElement("div");
    d.className = "card";
    const b = document.createElement("b"); b.textContent = col;
    const s = document.createElement("span"); s.textContent = ty;
    d.append(b, s);
    cards.append(d);
  }
}

function renderTable(rows, cols) {
  const table = document.getElementById("table");
  table.replaceChildren();
  const head = table.createTHead().insertRow();
  for (const c of cols) {
    const th = document.createElement("th"); th.textContent = c; head.append(th);
  }
  const body = table.createTBody();
  for (const row of rows) {
    const tr = body.insertRow();
    for (const c of cols) tr.insertCell().textContent = cellText(row[c]);
  }
}

function cellText(v) {
  if (v === null || v === undefined) return "";
  if (typeof v === "object") return JSON.stringify(v);
  return String(v);
}

// CSV export with RFC 4180-style quoting: fields containing a comma,
// quote, or newline are wrapped in quotes with embedded quotes doubled.
function csvField(v) {
  const s = cellText(v);
  return /[",\\n\\r]/.test(s) ? '"' + s.replaceAll('"', '""') + '"' : s;
}

document.getElementById("csv").addEventListener("click", () => {
  if (!lastResult) return;
  const cols = Object.keys(lastResult.types);
  const lines = [cols.map(csvField).join(",")];
  for (const row of lastResult.data)
    lines.push(cols.map((c) => csvField(row[c])).join(","));
  const blob = new Blob([lines.join("\\r\\n") + "\\r\\n"], { type: "text/csv" });
  const a = document.createElement("a");
  a.href = URL.createObjectURL(blob);
  a.download = "processed_data.csv";
  a.click();
  URL.revokeObjectURL(a.href);
});
</script>
</body>
</html>
"""
