"""Generate rules-bench/: a production-sized rule corpus (~150 rules).

Real Sagan deployments load hundreds of signatures (the sagan-rules repo
ships ~8k); the 28-rule fixture corpus under-represents the per-event
matching work, so a scaling benchmark on it measures parquet/Arrow
byte-shuffling more than rule evaluation.  This corpus keeps the fixture
corpus's matching rules (so sink outputs stay non-trivial) and adds ~130
realistic non-matching signatures with distinct content literals —
exactly the shape of a deployed ruleset where most signatures never fire.
"""

from __future__ import annotations

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SERVICES = ("sshd", "nginx", "postfix", "named", "snort", "kernel", "cron",
            "systemd", "mysqld", "httpd", "vsftpd", "openvpn", "pluto")
EVENTS = ("buffer overflow in", "format string attack", "directory traversal",
          "SQL injection attempt", "cross site scripting", "shellcode NOP sled",
          "privilege escalation via", "race condition exploit",
          "heap spray detected", "integer overflow in", "use after free",
          "null pointer dereference", "stack smashing detected",
          "command injection via", "LDAP injection attempt",
          "XML entity expansion", "SSRF attempt against", "CSRF token missing",
          "path disclosure in", "backdoor communication")
CLASSTYPES = ("attempted-admin", "attempted-recon", "misc-attack",
              "suspicious-command", "not-suspicious")


def main() -> None:
    import sys
    wide = "--wide" in sys.argv
    out_dir = os.path.join(REPO, "rules-bench")
    os.makedirs(out_dir, exist_ok=True)
    lines = ["# auto-generated production-sized bench corpus "
             "(tools/gen_rules.py)\n"]
    sid = 7000001
    variants = (("", ), ("attempt of ", "signature of ", "pattern: ")) [1]         if wide else ("",)
    for i, ev0 in enumerate(v + e for e in EVENTS for v in variants):
        ev = ev0
        for j, svc in enumerate(SERVICES[: 7 if i % 2 else 6]):
            ct = CLASSTYPES[(i + j) % len(CLASSTYPES)]
            opts = f'content:"{svc}"; content:"{ev}"'
            if (i + j) % 5 == 0:
                opts += "; nocase"
            if (i + j) % 7 == 0:
                opts = f'pcre:"/{svc}\\[[0-9]+\\]: .*{ev.split()[0]}/"'
            lines.append(
                f'alert syslog any any -> any any (msg:"B{sid % 100000} '
                f'{svc} {ev}"; {opts}; classtype:{ct}; sid:{sid}; rev:1;)')
            sid += 1
    with open(os.path.join(out_dir, "bench.rules"), "w") as f:
        f.write("\n".join(lines) + "\n")
    # matching rules + lookup configs: reuse the fixture corpus verbatim
    for name in ("test.rules", "classification.config", "reference.config",
                 "gen-msg.map", "ignore.txt", "blacklist.txt"):
        src = os.path.join(REPO, "rules-fixtures", name)
        if os.path.exists(src):
            with open(src) as fsrc, \
                    open(os.path.join(out_dir, name), "w") as fdst:
                fdst.write(fsrc.read())
    n = sid - 7000001
    print(f"wrote rules-bench/ with {n} generated + fixture rules")


if __name__ == "__main__":
    main()
