"""Random agent speaking the socket-env protocol — the reference's
``tests/socket_agent.py`` counterpart.

    python -m ngx.cli.socket_agent -env NovelGridworld-v6 -port 9000 -steps 100
"""

from __future__ import annotations

import argparse
import socket


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-env", default="NovelGridworld-v6")
    p.add_argument("-host", default="127.0.0.1")
    p.add_argument("-port", type=int, default=9000)
    p.add_argument("-steps", type=int, default=100)
    args = p.parse_args(argv)

    import ngx.compat as C
    env = C.make(args.env)

    sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    sock.connect((args.host, args.port))
    try:
        for _ in range(args.steps):
            action_id = env.action_space.sample()
            action = env.spec.actions[action_id]
            print("Sending action: ", action_id, action)
            sock.send(str.encode(action))
            observation = sock.recv(4096).decode()
            print("Received observation: ", observation[:120])
    finally:
        sock.close()


if __name__ == "__main__":
    main()
