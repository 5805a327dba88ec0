"""MongoDB connection-string builder/parser (U11).

Reference: core/src/main/java/com/mongodb/hadoop/util/
MongoClientURIBuilder.java:16-147 — a fluent builder the connector uses
to derive per-split and output URIs from a base one (swap collection,
add hosts, carry auth/options through).  This is the Python-native
equivalent for the live-backend seam (`sinks/live.py`): pure string
logic, fully testable without a server, and the shape
``MongoURI.parse(base).with_collection(db, coll)`` covers the
connector's actual uses (MongoConfigUtil.getMongoURI /
getOutputURI namespaces).

Connection-string grammar per the public MongoDB URI spec:
``mongodb://[user:pwd@]host1[:port1][,host2[:port2],...]/[db.coll][?k=v&...]``
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from urllib.parse import quote, unquote

DEFAULT_PORT = 27017


class InvalidMongoURI(ValueError):
    pass


@dataclass(frozen=True)
class MongoURI:
    """Immutable parsed connection string; ``with_*`` methods return new
    instances (the fluent-builder role, but value-semantic)."""

    hosts: tuple[tuple[str, int | None], ...] = (("localhost", None),)
    database: str | None = None
    collection: str | None = None
    username: str | None = None
    password: str | None = None
    params: tuple[tuple[str, str], ...] = ()

    # -- construction ----------------------------------------------------
    @classmethod
    def parse(cls, uri: str) -> "MongoURI":
        if not uri.startswith("mongodb://"):
            raise InvalidMongoURI(f"must start with mongodb:// — got {uri!r}")
        rest = uri[len("mongodb://"):]
        username = password = None
        if "@" in rest:
            cred, rest = rest.rsplit("@", 1)
            if ":" in cred:
                u, p = cred.split(":", 1)
                username, password = unquote(u), unquote(p)
            else:
                username = unquote(cred)
        params: list[tuple[str, str]] = []
        if "?" in rest:
            rest, qs = rest.split("?", 1)
            for kv in filter(None, qs.split("&")):
                if "=" not in kv:
                    raise InvalidMongoURI(f"malformed option {kv!r}")
                k, v = kv.split("=", 1)
                params.append((unquote(k), unquote(v)))
        database = collection = None
        if "/" in rest:
            hostpart, ns = rest.split("/", 1)
            if ns:
                if "." in ns:
                    database, collection = ns.split(".", 1)
                else:
                    database = ns
        else:
            hostpart = rest
        if not hostpart:
            raise InvalidMongoURI("no hosts in URI")
        hosts: list[tuple[str, int | None]] = []
        for h in hostpart.split(","):
            if ":" in h:
                name, port_s = h.rsplit(":", 1)
                try:
                    port = int(port_s)
                except ValueError as exc:
                    raise InvalidMongoURI(f"bad port in {h!r}") from exc
                hosts.append((name, port))
            else:
                hosts.append((h, None))
        return cls(hosts=tuple(hosts), database=database,
                   collection=collection, username=username,
                   password=password, params=tuple(params))

    # -- fluent updates (MongoClientURIBuilder.java:52-106 analogs) ------
    def with_host(self, host: str, port: int | None = None) -> "MongoURI":
        """Replace the host list with a single host."""
        return replace(self, hosts=((host, port),))

    def add_host(self, host: str, port: int | None = None) -> "MongoURI":
        return replace(self, hosts=self.hosts + ((host, port),))

    def with_port(self, port: int) -> "MongoURI":
        """Set the port on a single-host URI (Java port() semantics)."""
        if len(self.hosts) != 1:
            raise InvalidMongoURI("port() needs exactly one host")
        return replace(self, hosts=((self.hosts[0][0], port),))

    def with_collection(self, database: str, collection: str | None = None) -> "MongoURI":
        return replace(self, database=database, collection=collection)

    def with_auth(self, username: str, password: str | None = None) -> "MongoURI":
        return replace(self, username=username, password=password)

    def with_param(self, key: str, value: str) -> "MongoURI":
        kept = tuple((k, v) for k, v in self.params if k != key)
        return replace(self, params=kept + ((key, value),))

    def with_read_preference(self, pref: str) -> "MongoURI":
        return self.with_param("readPreference", pref)

    # -- accessors -------------------------------------------------------
    @property
    def namespace(self) -> str | None:
        if self.database and self.collection:
            return f"{self.database}.{self.collection}"
        return self.database

    def param(self, key: str, default: str | None = None) -> str | None:
        for k, v in self.params:
            if k == key:
                return v
        return default

    def resolved_hosts(self) -> list[tuple[str, int]]:
        return [(h, p if p is not None else DEFAULT_PORT)
                for h, p in self.hosts]

    # -- rendering -------------------------------------------------------
    def build(self) -> str:
        out = "mongodb://"
        if self.username is not None:
            out += quote(self.username, safe="")
            if self.password is not None:
                out += ":" + quote(self.password, safe="")
            out += "@"
        out += ",".join(h if p is None else f"{h}:{p}" for h, p in self.hosts)
        ns = self.namespace
        if ns or self.params:
            out += "/" + (ns or "")
        if self.params:
            out += "?" + "&".join(
                f"{quote(k, safe='')}={quote(v, safe='')}"
                for k, v in self.params)
        return out

    def __str__(self) -> str:  # pragma: no cover - convenience
        return self.build()
