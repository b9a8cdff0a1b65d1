package graft.qtest

import scala.collection.mutable

/** Clean-room model of Hive's authorization surface (ref
  * ql/security/authorization: DefaultHiveAuthorizationProvider for the
  * legacy "v1" mode, plugin/sqlstd/SQLStdHiveAccessController +
  * SQLStdHiveAuthorizationValidator + Operation2Privilege for SQL-std):
  * role registry, privilege grants, SHOW renderings, and the
  * enforcement rules the reference's clientpositive/clientnegative
  * authorization scripts pin. State is in-memory shadow metadata, the
  * same approach as the DESC FORMATTED stats ledger — the engine
  * executes statements through Spark; this answers what Hive's
  * authorizer would have allowed, recorded, and printed.
  *
  * Mode selection mirrors the reference's confs: the manager class name
  * picks v1 vs SQL-std, `hive.security.authorization.enabled` arms
  * enforcement, SessionStateConfigUserAuthenticator makes `user.name`
  * the current user, and `hive.users.in.admin.role` seeds who may SET
  * ROLE ADMIN.
  */
final class HiveAuth(conf: String => Option[String],
    fixtureTables: Seq[String] = Nil) {

  // ---- mode ------------------------------------------------------------

  private def manager: String =
    conf("hive.security.authorization.manager").getOrElse("")
  def sqlStd: Boolean = manager.toLowerCase.contains("sqlstd")
  def v1: Boolean = manager.contains("DefaultHiveAuthorizationProvider")
  def enabled: Boolean =
    conf("hive.security.authorization.enabled")
      .exists(_.trim.equalsIgnoreCase("true"))
  def currentUser: String =
    conf("user.name").map(_.trim).filter(_.nonEmpty)
      .getOrElse("hive_test_user")
  private def adminUsers: Set[String] =
    conf("hive.users.in.admin.role")
      .map(_.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSet)
      // the reference harness config seeds the admin list (ref
      // data/conf/hive-site.xml hive.users.in.admin.role)
      .getOrElse(Set("hive_admin_user"))

  // ---- state -----------------------------------------------------------

  /** lc role name -> name as typed at CREATE ROLE (SHOW ROLE GRANT
    * prints the original case; SHOW ROLES prints lowercase). */
  val roles: mutable.LinkedHashMap[String, String] =
    mutable.LinkedHashMap("admin" -> "admin", "public" -> "public")

  final case class RoleGrant(role: String, principal: String,
      ptype: String, adminOption: Boolean, grantor: String)
  val roleGrants: mutable.ArrayBuffer[RoleGrant] = mutable.ArrayBuffer.empty

  final case class PrivGrant(db: String, table: String, part: String,
      cols: Seq[String], principal: String, ptype: String, priv: String,
      grantOption: Boolean, grantor: String)
  val privs: mutable.ArrayBuffer[PrivGrant] = mutable.ArrayBuffer.empty

  /** SET ROLE overrides per user; absent = default (all granted roles +
    * public; admin NOT active by default even for admin users). */
  private val roleOverride = mutable.Map.empty[String, Set[String]]

  /** `set user.name=…` starts a fresh session for that user — any
    * previous SET ROLE state is gone (authorization_view_sqlstd shows
    * [public] for hive_admin_user after a re-switch). Also remembers
    * the script's FIRST session user: the metastore client identity
    * the harness records as grantor of owner privileges. */
  private var firstUser: Option[String] = None
  def userSwitched(newUser: String): Unit = {
    if (firstUser.isEmpty) firstUser = Some(newUser)
    roleOverride.remove(newUser.toLowerCase); ()
  }
  private def ownerGrantor: String = firstUser.getOrElse(currentUser)

  val tableOwners: mutable.Map[(String, String), String] =
    mutable.Map.empty // (lc display db, lc table) -> user
  val dbOwners: mutable.Map[String, String] = mutable.Map.empty

  def reset(): Unit = {
    firstUser = None
    roles.clear(); roles ++= Seq("admin" -> "admin", "public" -> "public")
    roleGrants.clear(); privs.clear(); roleOverride.clear()
    tableOwners.clear(); dbOwners.clear(); partLevelPriv.clear()
    // the harness user owns every init-script fixture table, and the
    // metastore carries the matching owner grants (authorization_9's
    // `show grant … on all` lists alltypesorc/src/… with the 4 DML
    // privileges); the admin role's global ALL is likewise built in
    privs += PrivGrant("*", "", "", Nil, "admin", "ROLE", "all",
      grantOption = true, "admin")
    fixtureTables.foreach { t =>
      Seq("delete", "insert", "select", "update").foreach { pr =>
        privs += PrivGrant("default", t.toLowerCase, "", Nil,
          "hive_test_user", "USER", pr, grantOption = true,
          "hive_test_user")
      }
      tableOwners(("default", t.toLowerCase)) = "hive_test_user"
    }
  }

  def recordTableOwner(db: String, table: String): Unit = {
    tableOwners((db.toLowerCase, table.toLowerCase)) = currentUser
    // creators receive explicit owner grants, visible in SHOW GRANT:
    // SQL-std gives the 4 DML privileges WITH GRANT OPTION (ref
    // SQLStdHiveAccessController.getDefaultOwnerPrivileges /
    // authorization_insert.q.out); v1 gives whatever
    // hive.security.authorization.createtable.owner.grants lists
    val ownerPrivs =
      if (sqlStd) Seq("delete", "insert", "select", "update")
      else conf("hive.security.authorization.createtable.owner.grants")
        .map(_.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
    ownerPrivs.foreach { pr =>
      if (!privs.exists(g => g.db == db.toLowerCase &&
          g.table == table.toLowerCase && g.priv == pr &&
          g.ptype == "USER" && g.principal.equalsIgnoreCase(currentUser)))
        privs += PrivGrant(db.toLowerCase, table.toLowerCase, "", Nil,
          currentUser, "USER", pr, grantOption = sqlStd, ownerGrantor)
    }
  }

  /** Tables whose partitions carry their own privilege scope (v1
    * PARTITION_LEVEL_PRIVILEGE=TRUE property). */
  val partLevelPriv: mutable.Set[(String, String)] = mutable.Set.empty

  /** An ADDed partition inherits the table's current grants as
    * partition-scoped copies, and a table-level GRANT on a
    * partition-scoped table fans out to the partitions existing at
    * grant time (ref ql/metadata/Hive.java copyTableLevelPrivs /
    * DDLSemanticAnalyzer under PARTITION_LEVEL_PRIVILEGE; the
    * authorization_2/authorization_6 goldens pin that INSERT-created
    * partitions do NOT inherit and DROP PARTITION does not revoke). */
  def inheritPartition(db: String, table: String, part: String): Unit = {
    if (!partLevelPriv.contains((db.toLowerCase, table.toLowerCase))) return
    val tblGrants = privs.toList.filter(g => g.db == db.toLowerCase &&
      g.table == table.toLowerCase && g.part.isEmpty)
    tblGrants.foreach { g =>
      if (!privs.exists(x => x.db == g.db && x.table == g.table &&
          x.part == part && x.cols == g.cols && x.priv == g.priv &&
          x.ptype == g.ptype && x.principal == g.principal))
        privs += g.copy(part = part)
    }
  }

  /** Fan a just-issued table-level grant out to existing partitions. */
  def fanOutToPartitions(db: String, table: String,
      parts: Seq[String]): Unit = {
    if (!partLevelPriv.contains((db.toLowerCase, table.toLowerCase))) return
    parts.foreach(inheritPartition(db, table, _))
  }
  def recordDbOwner(db: String): Unit =
    dbOwners(db.toLowerCase) = currentUser
  def dropTable(db: String, table: String): Unit = {
    tableOwners.remove((db.toLowerCase, table.toLowerCase))
    partLevelPriv.remove((db.toLowerCase, table.toLowerCase))
    val d = db.toLowerCase; val t = table.toLowerCase
    val kept = privs.filterNot(p => p.db == d && p.table == t)
    privs.clear(); privs ++= kept
  }

  // ---- role membership ---------------------------------------------------

  /** All roles granted to a user transitively (via role->role grants),
    * plus public. */
  private def grantedRoles(user: String): Set[String] = {
    val direct = roleGrants.collect {
      case g if g.ptype == "USER" && g.principal.equalsIgnoreCase(user) =>
        g.role
    }.toSet
    val out = mutable.Set.empty[String] ++ direct
    var frontier = direct
    while (frontier.nonEmpty) {
      val next = roleGrants.collect {
        case g if g.ptype == "ROLE" &&
            frontier.contains(g.principal.toLowerCase) => g.role
      }.toSet -- out
      out ++= next
      frontier = next
    }
    out.toSet + "public"
  }

  /** The user's ACTIVE roles (SET ROLE honored). */
  def currentRoles(user: String): Set[String] =
    roleOverride.getOrElse(user.toLowerCase,
      grantedRoles(user) - "admin")

  def adminActive: Boolean = currentRoles(currentUser).contains("admin")

  // ---- statements --------------------------------------------------------

  def createRole(name: String): Unit = {
    val lc = name.toLowerCase
    if (Set("all", "none", "default").contains(lc))
      throw new IllegalArgumentException(
        s"Failed to recognize predicate '$name': reserved role name")
    if (sqlStd && !adminActive)
      throw new IllegalArgumentException(
        s"Current user : $currentUser is not allowed to add roles. " +
          "User has to belong to ADMIN role and have it as current role, " +
          "for this action.")
    if (Set("public", "admin").contains(lc))
      throw new IllegalArgumentException(
        s"Role name cannot be one of the reserved roles: $name")
    if (roles.contains(lc))
      throw new IllegalArgumentException(s"Role $name already exists.")
    // SQL-std lowercases role names at creation (src_Role2 prints
    // src_role2); v1 keeps the typed case (sRc_roLE)
    roles(lc) = if (sqlStd) lc else name
  }

  def dropRole(name: String): Unit = {
    val lc = name.toLowerCase
    if (sqlStd && !adminActive)
      throw new IllegalArgumentException(
        s"Current user : $currentUser is not allowed to drop roles.")
    if (Set("public", "admin").contains(lc))
      throw new IllegalArgumentException(
        s"Error dropping role: $lc is a reserved role")
    if (!roles.contains(lc))
      throw new IllegalArgumentException(s"Role $name does not exist.")
    roles.remove(lc)
    val keptR = roleGrants.filterNot(g => g.role == lc)
    roleGrants.clear(); roleGrants ++= keptR
    val keptP = privs.filterNot(p => p.ptype == "ROLE" &&
      p.principal.equalsIgnoreCase(lc))
    privs.clear(); privs ++= keptP
    roleOverride.keys.toList.foreach { u =>
      roleOverride(u) = roleOverride(u) - lc
    }
  }

  def grantRole(roleNames: Seq[String], principals: Seq[(String, String)],
      adminOption: Boolean): Unit = {
    roleNames.foreach { rn =>
      val lc = rn.toLowerCase
      if (!roles.contains(lc))
        throw new IllegalArgumentException(
          s"Error granting roles for ${principals.map(_._2).mkString(",")}" +
            s": no such role $rn")
      if (lc == "public" || lc == "admin")
        throw new IllegalArgumentException(
          s"Error granting role: $lc is a reserved role")
      if (sqlStd && !adminActive && !hasAdminOptionOn(lc))
        throw new IllegalArgumentException(
          s"Current user : $currentUser is not allowed to grant role. " +
            "User has to belong to ADMIN role and have it as current " +
            "role, for this action. Otherwise, grantor need to have " +
            "ADMIN OPTION on role being granted")
      principals.foreach { case (ptype, p) =>
        if (ptype == "ROLE" && !roles.contains(p.toLowerCase))
          throw new IllegalArgumentException(
            s"Error granting roles for $p: no such role principal")
        // role->role cycles are rejected in the metastore (ref
        // HiveMetaStore add_role_member cycle check)
        if (ptype == "ROLE" && wouldCycle(lc, p.toLowerCase))
          throw new IllegalArgumentException(
            s"Error granting role: Cannot grant role $rn to ${p} as " +
              s"$p already belongs to the role $rn. (no cycles allowed)")
        roleGrants += RoleGrant(lc,
          if (ptype == "ROLE" && sqlStd) p.toLowerCase else p,
          ptype, adminOption, currentUser)
      }
    }
  }

  private def hasAdminOptionOn(role: String): Boolean =
    // the option only counts while the role is ACTIVE (SET ROLE to a
    // different role suspends it — clientnegative
    // authorization_role_grant)
    currentRoles(currentUser).contains(role) &&
      roleGrants.exists(g => g.role == role && g.adminOption &&
        g.ptype == "USER" && g.principal.equalsIgnoreCase(currentUser))

  /** Would granting `role` to role `member` create a cycle? */
  private def wouldCycle(role: String, member: String): Boolean = {
    if (role == member) return true
    // roles reachable FROM member (member's transitive members)
    var frontier = Set(member)
    val seen = mutable.Set.empty[String] ++ frontier
    while (frontier.nonEmpty) {
      val next = roleGrants.collect {
        case g if g.ptype == "ROLE" && frontier.contains(g.role) =>
          g.principal.toLowerCase
      }.toSet -- seen
      seen ++= next
      frontier = next
    }
    seen.contains(role)
  }

  def revokeRole(roleNames: Seq[String],
      principals: Seq[(String, String)],
      adminOptionOnly: Boolean = false): Unit = {
    roleNames.foreach { rn =>
      val lc = rn.toLowerCase
      if (lc == "public" || lc == "admin")
        throw new IllegalArgumentException(
          s"Error revoking role: $lc is a reserved role")
      if (!roles.contains(lc))
        throw new IllegalArgumentException(s"no such role $rn")
      if (sqlStd && !adminActive && !hasAdminOptionOn(lc))
        throw new IllegalArgumentException(
          s"Current user : $currentUser is not allowed to revoke role.")
      principals.foreach { case (ptype, p) =>
        if (adminOptionOnly) {
          // REVOKE ADMIN OPTION FOR keeps the membership, drops the
          // option (authorization_role_grant1)
          roleGrants.indices.foreach { i =>
            val g = roleGrants(i)
            if (g.role == lc && g.ptype == ptype &&
                g.principal.equalsIgnoreCase(p))
              roleGrants(i) = g.copy(adminOption = false)
          }
        } else {
          val kept = roleGrants.filterNot(g => g.role == lc &&
            g.ptype == ptype && g.principal.equalsIgnoreCase(p))
          roleGrants.clear(); roleGrants ++= kept
        }
      }
    }
  }

  def setRole(name: String): Unit = {
    val lc = name.toLowerCase
    val u = currentUser
    // SET ROLE r activates exactly r (SHOW CURRENT ROLES prints only
    // it); ALL restores the default set, NONE empties it
    lc match {
      case "all" => roleOverride.remove(u.toLowerCase); ()
      case "none" => roleOverride(u.toLowerCase) = Set.empty
      case "admin" =>
        if (!adminUsers.contains(u.toLowerCase) &&
            !grantedRoles(u).contains("admin"))
          throw new IllegalArgumentException(
            s"$u doesn't belong to role admin")
        roleOverride(u.toLowerCase) = Set("admin")
      case r =>
        if (!grantedRoles(u).contains(r))
          throw new IllegalArgumentException(s"$u doesn't belong to role $r")
        roleOverride(u.toLowerCase) = Set(r)
    }
  }

  // ---- privilege grants ---------------------------------------------------

  private val V1Privs = Set("all", "alter", "update", "create", "drop",
    "index", "lock", "select", "show_database")
  def isV1Priv(name: String): Boolean = V1Privs.contains(name.toLowerCase)
  private val SqlStdPrivs = Set("select", "insert", "update", "delete")

  def validatePriv(priv: String): Unit = {
    val lc = priv.toLowerCase
    if (sqlStd) {
      if (lc == "all") () // owner may grant ALL
      else if (!SqlStdPrivs.contains(lc))
        throw new IllegalArgumentException(
          s"Unsupported privilege type ${priv.toUpperCase}")
    } else if (!V1Privs.contains(lc))
      throw new IllegalArgumentException(s"Undefined privilege $priv")
  }

  def grantPriv(privNames: Seq[(String, Seq[String])], db: String,
      table: String, part: String, principals: Seq[(String, String)],
      grantOption: Boolean): Unit = {
    privNames.foreach { case (priv, _) => validatePriv(priv) }
    if (sqlStd) {
      principals.foreach { case (ptype, _) =>
        if (ptype == "GROUP")
          throw new IllegalArgumentException(
            "Invalid principal type in principal: GROUP is not " +
              "supported in sql standard authorization mode")
      }
      // grantor must own the object or hold the privilege WITH GRANT
      // OPTION (ref SQLStdHiveAccessController.grantPrivileges)
      val owner = table.nonEmpty &&
        tableOwners.get((db.toLowerCase, table.toLowerCase))
          .exists(_.equalsIgnoreCase(currentUser))
      val dbOwner = table.isEmpty &&
        dbOwners.get(db.toLowerCase).exists(_.equalsIgnoreCase(currentUser))
      if (!owner && !dbOwner && !adminActive) {
        privNames.foreach { case (priv, _) =>
          val lc0 = priv.toLowerCase
          val comps =
            if (lc0 == "all") Seq("select", "insert", "update", "delete")
            else Seq(lc0)
          comps.foreach { lc =>
            if (!holdsWithGrant(currentUser, db, table, lc))
              throw new IllegalArgumentException(
                s"Permission denied: Principal [name=$currentUser, " +
                  "type=USER] does not have following privileges for " +
                  s"operation GRANT_PRIVILEGE [${lc.toUpperCase} with grant]")
          }
        }
      }
      dupCheck(privNames, db, table, part, principals)
    } else dupCheck(privNames, db, table, part, principals)
    principals.foreach { case (ptype, p) =>
      // legacy (v1) role lookups are case-SENSITIVE against the stored
      // name (clientnegative authorization_role_case: mixcaserole2 vs
      // mixCaseRole2); sql-std lowercases both sides
      val roleKnown =
        if (sqlStd) roles.contains(p.toLowerCase)
        else roles.get(p.toLowerCase).contains(p)
      if (ptype == "ROLE" && !roleKnown)
        throw new IllegalArgumentException(
          s"Error granting privileges: Role ${p.toLowerCase} does not exist")
      privNames.foreach { case (priv, cols) =>
        val lc0 = priv.toLowerCase
        val expanded =
          if (sqlStd && lc0 == "all")
            Seq("select", "insert", "update", "delete")
          else Seq(lc0)
        expanded.foreach { lc =>
          // SQL-std stores role principals lowercased (`rolea` for a
          // role created as roleA); v1 keeps the typed case (sRc_roLE,
          // authorization_1.q.out)
          val pn = if (ptype == "ROLE" && sqlStd) p.toLowerCase else p
          // a multi-column grant is stored one grant PER COLUMN
          // (authorization_9's `grant select (key, value)` shows
          // [key] and [value] rows)
          val colSets: Seq[Seq[String]] =
            if (cols.isEmpty) Seq(Nil) else cols.map(Seq(_))
          colSets.foreach { cs =>
            privs += PrivGrant(db.toLowerCase, table.toLowerCase, part,
              cs, pn, ptype, lc, grantOption, currentUser)
          }
        }
      }
    }
  }

  /** A re-grant of a privilege the principal already holds is an error
    * in both modes (authorization_fail_1, authorization_grant_table_dup). */
  private def dupCheck(privNames: Seq[(String, Seq[String])], db: String,
      table: String, part: String,
      principals: Seq[(String, String)]): Unit = {
      privNames.foreach { case (priv, cols) =>
        val lc0 = priv.toLowerCase
        val expanded =
          if (lc0 == "all") Seq("select", "insert", "update", "delete")
          else Seq(lc0)
        // scope-aware: a column grant after a table grant is NOT a
        // duplicate (authorization_9); only an identical scope is
        val colSets: Seq[Seq[String]] =
          if (cols.isEmpty) Seq(Nil) else cols.map(Seq(_))
        expanded.foreach { lc =>
          principals.foreach { case (ptype, p) =>
            colSets.foreach { cs =>
              // partition scope is part of the grant identity, same
              // as revokePriv's matching (ADVICE r12): a partition
              // grant after a table-level grant is not a duplicate
              if (privs.exists(g => g.db == db.toLowerCase &&
                  g.table == table.toLowerCase && g.priv == lc &&
                  g.part == part &&
                  g.ptype == ptype && g.principal.equalsIgnoreCase(p) &&
                  g.cols.map(_.toLowerCase) == cs.map(_.toLowerCase)))
                throw new IllegalArgumentException(
                  s"Error granting privileges: $p already has " +
                    s"$lc privilege on the object")
            }
          }
        }
      }
  }

  def revokePriv(privNames: Seq[(String, Seq[String])], db: String,
      table: String, part: String,
      principals: Seq[(String, String)],
      grantOptionOnly: Boolean = false): Unit = {
    privNames.foreach { case (priv, _) => validatePriv(priv) }
    if (sqlStd && !adminActive) {
      val owner = table.nonEmpty &&
        tableOwners.get((db.toLowerCase, table.toLowerCase))
          .exists(_.equalsIgnoreCase(currentUser))
      if (!owner)
        throw new IllegalArgumentException(
          s"Permission denied: Principal [name=$currentUser, type=USER] " +
            "does not have following privileges for operation " +
            "REVOKE_PRIVILEGE [OBJECT OWNERSHIP]")
    }
    principals.foreach { case (ptype, p) =>
      privNames.foreach { case (priv, cols) =>
        val lc0 = priv.toLowerCase
        val expanded =
          if (sqlStd && lc0 == "all")
            Seq("select", "insert", "update", "delete")
          else Seq(lc0)
        val colSets: Seq[Seq[String]] =
          if (cols.isEmpty) Seq(Nil) else cols.map(Seq(_))
        expanded.foreach { lc =>
          colSets.foreach { cs =>
          val idx = privs.indexWhere(g => g.db == db.toLowerCase &&
            g.table == table.toLowerCase && g.priv == lc &&
            g.ptype == ptype && g.principal.equalsIgnoreCase(p) &&
            g.part == part && g.cols.map(_.toLowerCase) ==
              cs.map(_.toLowerCase))
          if (idx < 0) {
            if (sqlStd)
              throw new IllegalArgumentException(
                s"Cannot find privilege Privilege [name=${lc.toUpperCase}" +
                  s", columns=null] for Principal [name=$p, " +
                  s"type=$ptype] on Object")
            // v1 revoke of an absent grant is a silent no-op
          } else if (grantOptionOnly)
            // REVOKE GRANT OPTION FOR keeps the privilege, drops the
            // option (authorization_revoke_table_priv)
            privs(idx) = privs(idx).copy(grantOption = false)
          else { privs.remove(idx); () }
          }
        }
      }
    }
  }

  /** Does the user hold `priv` (directly or via active roles) on the
    * object, with grant option? */
  private def holdsWithGrant(user: String, db: String, table: String,
      priv: String): Boolean =
    resolved(user, db, table).exists(g => g.priv == priv && g.grantOption)

  /** Grants visible to a user on an object: direct + active roles. */
  private def resolved(user: String, db: String,
      table: String): Seq[PrivGrant] = {
    val rs = currentRoles(user)
    privs.toSeq.filter { g =>
      g.db == db.toLowerCase &&
        (table.isEmpty || g.table == table.toLowerCase) &&
        ((g.ptype == "USER" && g.principal.equalsIgnoreCase(user)) ||
          (g.ptype == "ROLE" && rs.contains(g.principal.toLowerCase)))
    }
  }

  /** v1 check + sql-std check share this: priv present for user on
    * (db, table) from any principal type (v1 includes GROUP grants —
    * test users belong to hive_test_group1, ref QTestUtil ugi). */
  def hasPriv(user: String, groups: Set[String], db: String, table: String,
      part: Option[String], cols: Seq[String], priv: String,
      anyScope: Boolean = false): Boolean = {
    val rs = currentRoles(user)
    val cand = privs.toSeq.filter { g =>
      (g.db == "*" ||
        (g.db == db.toLowerCase && g.table == table.toLowerCase)) &&
        (g.priv == priv || g.priv == "all") &&
        ((g.ptype == "USER" && g.principal.equalsIgnoreCase(user)) ||
          (g.ptype == "ROLE" && rs.contains(g.principal.toLowerCase)) ||
          (g.ptype == "GROUP" &&
            groups.contains(g.principal.toLowerCase)))
    }
    // partition-scoped grants satisfy only their partition; a grant
    // without partition covers all. Column-scoped grants must cover
    // every requested column (empty request = table-level need) —
    // except anyScope reads (a QUERY is satisfied by any read grant
    // on the table, the harness does not column-resolve queries).
    if (anyScope) cand.nonEmpty
    else cand.exists { g =>
      (g.part.isEmpty || part.contains(g.part)) &&
        (g.cols.isEmpty ||
          (cols.nonEmpty && cols.forall(c =>
            g.cols.exists(_.equalsIgnoreCase(c)))))
    }
  }

  /** v1 partition-scope check: with PARTITION_LEVEL_PRIVILEGE on, a
    * read needs a partition-scoped select on every existing partition
    * (clientnegative authorization_fail_5: revoking one partition's
    * select denies the read even though the table grant remains). */
  def uncoveredPartitions(user: String, groups: Set[String], db: String,
      table: String, existing: Seq[String]): Seq[String] = {
    if (!partLevelPriv.contains((db.toLowerCase, table.toLowerCase)))
      return Nil
    val rs = currentRoles(user)
    existing.filterNot { part =>
      privs.exists { g =>
        g.db == db.toLowerCase && g.table == table.toLowerCase &&
          g.part == part && (g.priv == "select" || g.priv == "all") &&
          ((g.ptype == "USER" && g.principal.equalsIgnoreCase(user)) ||
            (g.ptype == "ROLE" && rs.contains(g.principal.toLowerCase)) ||
            (g.ptype == "GROUP" && groups.contains(g.principal.toLowerCase)))
      }
    }
  }

  /** v1 column check: with only COLUMN-scoped select grants on the
    * table, every referenced column must be covered
    * (authorization_view_2: a join on an ungranted column is denied).
    * Returns the uncovered columns; empty = allowed. */
  def uncoveredColumns(user: String, groups: Set[String], db: String,
      table: String, usedCols: Seq[String]): Seq[String] = {
    val rs = currentRoles(user)
    val grants = privs.toSeq.filter { g =>
      (g.db == "*" ||
        (g.db == db.toLowerCase && g.table == table.toLowerCase)) &&
        (g.priv == "select" || g.priv == "all") &&
        ((g.ptype == "USER" && g.principal.equalsIgnoreCase(user)) ||
          (g.ptype == "ROLE" && rs.contains(g.principal.toLowerCase)) ||
          (g.ptype == "GROUP" && groups.contains(g.principal.toLowerCase)))
    }
    if (grants.isEmpty || grants.exists(_.cols.isEmpty)) return Nil
    val covered = grants.flatMap(_.cols).map(_.toLowerCase).toSet
    usedCols.filterNot(c => covered.contains(c.toLowerCase))
  }

  def isTableOwner(db: String, table: String): Boolean =
    tableOwners.get((db.toLowerCase, table.toLowerCase))
      .exists(_.equalsIgnoreCase(currentUser))
  def isDbOwner(db: String): Boolean =
    dbOwners.get(db.toLowerCase).exists(_.equalsIgnoreCase(currentUser))

  def denied(op: String, missing: String, obj: String): Nothing =
    throw new IllegalArgumentException(
      s"Permission denied: Principal [name=$currentUser, type=USER] " +
        s"does not have following privileges for operation $op " +
        s"[[$missing] on Object [type=TABLE_OR_VIEW, name=$obj]]")

  // ---- SHOW renderings ---------------------------------------------------

  /** SHOW GRANT rows: db, table, partition, [cols], principal, ptype,
    * priv, grantOption, grantTime(-1), grantor (ref
    * DDLTask.showGrants / the writeGrantInfo text form). */
  def showGrant(principal: Option[(String, String)], db: Option[String],
      table: Option[String], cols: Seq[String],
      part: Option[String], includeGlobal: Boolean = true)
      : Seq[String] = {
    if (sqlStd && !adminActive && principal.isEmpty && db.isEmpty)
      throw new IllegalArgumentException(
        "Error showing privileges: User : " + currentUser +
          " is not allowed check privileges of all users")
    if (sqlStd) principal.foreach { case (ptype, p) =>
      // non-admin may only look at their own grants
      if (!adminActive && ptype == "USER" &&
          !p.equalsIgnoreCase(currentUser))
        throw new IllegalArgumentException(
          "Error showing privileges: User : " + currentUser +
            " is not allowed check privileges of another user : " + p)
      if (!adminActive && ptype == "ROLE" &&
          !currentRoles(currentUser).contains(p.toLowerCase))
        throw new IllegalArgumentException(
          "Error showing privileges: User : " + currentUser +
            " is not allowed check privileges of a role it does not " +
            "belong to : " + p)
    }
    val objectScoped = db.isDefined
    val rows = privs.toSeq.filter { g =>
      (includeGlobal || g.db != "*") &&
      principal.forall { case (ptype, p) =>
        g.ptype == ptype && g.principal.equalsIgnoreCase(p)
      } &&
        db.forall(d => g.db == d.toLowerCase) &&
        (table match {
          case Some(t) => g.table == t.toLowerCase
          case None => if (objectScoped) g.table.isEmpty else true
        }) &&
        (if (cols.isEmpty) true
        else g.cols.nonEmpty && cols.forall(c =>
          g.cols.exists(_.equalsIgnoreCase(c)))) &&
        (if (cols.isEmpty && table.isDefined) g.cols.isEmpty else true) &&
        (part match {
          case Some(p) => g.part == p
          case None => if (objectScoped) g.part.isEmpty else true
        })
    }
    def dbKey(g: PrivGrant) = if (g.db == "*") "" else g.db
    rows.sortBy(g => (dbKey(g), g.table, g.part,
      g.cols.mkString(","), g.principal.toLowerCase, g.priv))
      .map { g =>
        val colStr = if (g.cols.isEmpty) "" else
          g.cols.mkString("[", ", ", "]")
        val objectFields =
          Seq(if (g.db == "*") "" else g.db, g.table, g.part, colStr)
        (objectFields ++ Seq(g.principal, g.ptype,
          g.priv.toUpperCase, g.grantOption.toString, "-1",
          g.grantor)).mkString("\t")
      }
  }

  /** SHOW ROLE GRANT rows: role, grantOption(admin), grantTime, grantor;
    * public has an empty grantor. Sorted case-insensitively. */
  def showRoleGrant(ptype: String, p: String): Seq[String] = {
    if (sqlStd && !adminActive && ptype == "USER" &&
        !p.equalsIgnoreCase(currentUser))
      throw new IllegalArgumentException(
        "Error getting role grant information for user " + p +
          ": currentUser is not an admin")
    // a member of the role (directly or via the role hierarchy) may
    // inspect it (authorization_role_grant2: user3 on src_role2)
    if (sqlStd && !adminActive && ptype == "ROLE" &&
        !grantedRoles(currentUser).contains(p.toLowerCase))
      throw new IllegalArgumentException(
        "Error getting role grant information for role " + p +
          ": currentUser is not an admin")
    val named = roleGrants.toSeq.filter(g =>
      g.ptype == ptype && g.principal.equalsIgnoreCase(p))
      .map(g => (roles.getOrElse(g.role, g.role), g.adminOption.toString,
        "-1", g.grantor))
    val pub =
      if (ptype == "USER") Seq(("public", "false", "-1", "")) else Nil
    (named ++ pub).sortBy(_._1.toLowerCase)
      .map { case (r, a, t, gr) => s"$r\t$a\t$t\t$gr" }
  }

  def showRoles(): Seq[String] = {
    if (sqlStd && !adminActive)
      throw new IllegalArgumentException(
        s"Current user : $currentUser is not allowed to list roles. " +
          "User has to belong to ADMIN role and have it as current role")
    roles.keys.toSeq.sorted
  }

  def showCurrentRoles(): Seq[String] =
    currentRoles(currentUser).toSeq.sorted

  /** SHOW PRINCIPALS role: principal, ptype, grantOption, grantTime,
    * grantor. */
  def showPrincipals(role: String): Seq[String] = {
    if (sqlStd && !adminActive && !hasAdminOptionOn(role.toLowerCase))
      throw new IllegalArgumentException(
        s"Current user : $currentUser is not allowed get principals in " +
          "a role. User has to belong to ADMIN role and have it as " +
          "current role")
    if (!roles.contains(role.toLowerCase))
      throw new IllegalArgumentException(s"Role $role does not exist")
    // principal, type, grant_option, grantor, grantor_type, grant_time
    roleGrants.toSeq.filter(_.role == role.toLowerCase)
      .sortBy(g => (g.principal.toLowerCase, g.ptype))
      .map(g => Seq(g.principal, g.ptype, g.adminOption.toString,
        g.grantor, "USER", "-1").mkString("\t"))
  }
}
