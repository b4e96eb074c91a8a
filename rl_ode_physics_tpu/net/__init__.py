"""Host-side networking: wire protocol, authoritative server, client, lockstep replay."""
