/* Single-rank MPI stub implementation (see mpi.h).
 *
 * Self-messaging: the reference's ghost exchange posts Irecv/Isend pairs
 * whose 1-rank periodic neighbor is always rank 0 itself, so every recv is
 * eventually matched by a send with the same tag in the same process.  We
 * keep a queue of unmatched sends (data copied out, the sender may reuse
 * its buffer) and a queue of pending recvs (matched when the send arrives
 * or at MPI_Wait time).
 */
#include "mpi.h"

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#define DT_SIZE(dt) ((size_t)((dt) & 0xffff))
#define MAXQ 4096

typedef struct {
    int used, tag;
    void *data;        /* owned copy (sends) */
    size_t bytes;
} SendEntry;

typedef struct {
    int used, done, tag;
    void *buf;         /* caller's recv buffer */
    size_t bytes;
} RecvEntry;

static SendEntry sends[MAXQ];
static RecvEntry recvs[MAXQ];

/* request encoding: 0 = instantly-complete, 1..MAXQ = recv slot r-1 */
static int deliver(int tag, const void *data, size_t bytes) {
    for (int i = 0; i < MAXQ; i++) {
        if (recvs[i].used && !recvs[i].done && recvs[i].tag == tag) {
            if (bytes > recvs[i].bytes) bytes = recvs[i].bytes;
            memcpy(recvs[i].buf, data, bytes);
            recvs[i].done = 1;
            return 1;
        }
    }
    return 0;
}

static void queue_send(int tag, const void *data, size_t bytes) {
    for (int i = 0; i < MAXQ; i++) {
        if (!sends[i].used) {
            sends[i].used = 1;
            sends[i].tag = tag;
            sends[i].bytes = bytes;
            sends[i].data = malloc(bytes);
            memcpy(sends[i].data, data, bytes);
            return;
        }
    }
    fprintf(stderr, "mpi_stub: send queue overflow\n");
    abort();
}

static int match_send(int tag, void *buf, size_t bytes) {
    for (int i = 0; i < MAXQ; i++) {
        if (sends[i].used && sends[i].tag == tag) {
            size_t n = sends[i].bytes < bytes ? sends[i].bytes : bytes;
            memcpy(buf, sends[i].data, n);
            free(sends[i].data);
            sends[i].used = 0;
            return 1;
        }
    }
    return 0;
}

int MPI_Init(int *argc, char ***argv) { (void)argc; (void)argv; return 0; }
int MPI_Finalize(void) { return 0; }
int MPI_Abort(MPI_Comm c, int e) { (void)c; exit(e); }
int MPI_Comm_rank(MPI_Comm c, int *rank) { (void)c; *rank = 0; return 0; }
int MPI_Comm_size(MPI_Comm c, int *size) { (void)c; *size = 1; return 0; }
int MPI_Comm_group(MPI_Comm c, MPI_Group *g) { (void)c; *g = 0; return 0; }
int MPI_Comm_create(MPI_Comm c, MPI_Group g, MPI_Comm *nc) {
    (void)c; (void)g; *nc = 0; return 0;
}
int MPI_Comm_free(MPI_Comm *c) { (void)c; return 0; }
int MPI_Group_incl(MPI_Group g, int n, const int *r, MPI_Group *ng) {
    (void)g; (void)n; (void)r; *ng = 0; return 0;
}
int MPI_Group_free(MPI_Group *g) { (void)g; return 0; }
int MPI_Cart_create(MPI_Comm c, int nd, const int *dims, const int *per,
                    int re, MPI_Comm *cc) {
    (void)c; (void)nd; (void)dims; (void)per; (void)re; *cc = 0; return 0;
}
int MPI_Cart_coords(MPI_Comm c, int rank, int maxdims, int *coords) {
    (void)c; (void)rank;
    for (int i = 0; i < maxdims; i++) coords[i] = 0;
    return 0;
}
int MPI_Cart_rank(MPI_Comm c, const int *coords, int *rank) {
    (void)c; (void)coords; *rank = 0; return 0;
}
int MPI_Barrier(MPI_Comm c) { (void)c; return 0; }
int MPI_Bcast(void *b, int n, MPI_Datatype dt, int root, MPI_Comm c) {
    (void)b; (void)n; (void)dt; (void)root; (void)c; return 0;
}
int MPI_Allreduce(const void *s, void *r, int n, MPI_Datatype dt, MPI_Op op,
                  MPI_Comm c) {
    (void)op; (void)c;
    if (s != r) memcpy(r, s, n * DT_SIZE(dt));
    return 0;
}
int MPI_Iallreduce(const void *s, void *r, int n, MPI_Datatype dt, MPI_Op op,
                   MPI_Comm c, MPI_Request *req) {
    MPI_Allreduce(s, r, n, dt, op, c);
    *req = 0;
    return 0;
}
int MPI_Reduce(const void *s, void *r, int n, MPI_Datatype dt, MPI_Op op,
               int root, MPI_Comm c) {
    (void)root;
    return MPI_Allreduce(s, r, n, dt, op, c);
}
int MPI_Send(const void *b, int n, MPI_Datatype dt, int dest, int tag,
             MPI_Comm c) {
    (void)dest; (void)c;
    size_t bytes = n * DT_SIZE(dt);
    if (!deliver(tag, b, bytes)) queue_send(tag, b, bytes);
    return 0;
}
int MPI_Recv(void *b, int n, MPI_Datatype dt, int src, int tag, MPI_Comm c,
             MPI_Status *st) {
    (void)src; (void)c; (void)st;
    if (!match_send(tag, b, n * DT_SIZE(dt))) {
        fprintf(stderr, "mpi_stub: blocking Recv with no matching send "
                        "(tag %d)\n", tag);
        abort();
    }
    return 0;
}
int MPI_Isend(const void *b, int n, MPI_Datatype dt, int dest, int tag,
              MPI_Comm c, MPI_Request *req) {
    MPI_Send(b, n, dt, dest, tag, c);
    *req = 0;
    return 0;
}
int MPI_Irecv(void *b, int n, MPI_Datatype dt, int src, int tag, MPI_Comm c,
              MPI_Request *req) {
    (void)src; (void)c;
    size_t bytes = n * DT_SIZE(dt);
    if (match_send(tag, b, bytes)) {
        *req = 0;
        return 0;
    }
    for (int i = 0; i < MAXQ; i++) {
        if (!recvs[i].used) {
            recvs[i].used = 1;
            recvs[i].done = 0;
            recvs[i].tag = tag;
            recvs[i].buf = b;
            recvs[i].bytes = bytes;
            *req = i + 1;
            return 0;
        }
    }
    fprintf(stderr, "mpi_stub: recv queue overflow\n");
    abort();
}
int MPI_Wait(MPI_Request *req, MPI_Status *st) {
    (void)st;
    int r = *req;
    *req = MPI_REQUEST_NULL;
    if (r <= 0) return 0;          /* already complete */
    RecvEntry *e = &recvs[r - 1];
    if (!e->done) {
        fprintf(stderr, "mpi_stub: Wait on unmatched recv (tag %d)\n", e->tag);
        abort();
    }
    e->used = 0;
    return 0;
}
int MPI_Waitall(int n, MPI_Request *reqs, MPI_Status *sts) {
    (void)sts;
    for (int i = 0; i < n; i++) MPI_Wait(&reqs[i], MPI_STATUS_IGNORE);
    return 0;
}
int MPI_Info_create(MPI_Info *info) { *info = 0; return 0; }
int MPI_Info_set(MPI_Info i, const char *k, const char *v) {
    (void)i; (void)k; (void)v; return 0;
}
double MPI_Wtime(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}
